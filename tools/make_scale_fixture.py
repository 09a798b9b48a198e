"""Deterministic third-scale-point fixture: sf0.3 by 3x tiling of the
driver's sf0.1 tables (round-11 verdict item 1).

Every 100 TB growth claim previously rested on a TWO-point
sf0.01→sf0.1 curve in tests/test_scale_curve.py — two points cannot
distinguish n·log n from n^1.3. This builds a ~3x dataset WITHOUT
touching /root/testdata (read-only): the classic benchmark *tiling*
scale-up (same technique TPC uses for dbgen parallel chunks — each
tile is exactly the reference distribution with keys offset into a
disjoint range), which is deterministic, seedless, and documented
here rather than reverse-engineering the driver's generator.

Tile construction (T = 3 tiles, tile 0 = the sf0.1 rows verbatim):

- surrogate keys get `+ tile * 10^9` (disjoint ranges, FKs offset
  consistently so tile-t facts reference tile-t dimensions);
- `region`/`nation` are DOMAIN tables — single copy (as in TPC-H,
  nation/region don't scale with SF), so nationkey references stay
  valid from every tile;
- `documents.text` in tiles > 0 goes through a WORD-IDENTITY mapping:
  words whose crc32 ≡ tile-1 (mod 4) are suffixed `~<tile>` — an
  injective per-tile vocabulary renaming, NOT positional. Injective
  word mapping preserves within-tile shingle-set overlap EXACTLY
  (shared shingles map to shared shingles, distinct stay distinct),
  so every tile reproduces the sf0.1 near-dup pair/clique structure
  verbatim and within-tile dedup volumes triple EXACTLY; across
  tiles, ~50% of tokens differ between any two tiles' copies of a
  doc (disjoint crc32 classes), so 3-shingle Jaccard falls to ~0.07
  ≪ the 0.7 threshold and cross-tile duplicates break. (A first cut
  used positional every-4th-word replacement; it misaligned between
  near-dup pairs and silently DAMPED the structure — graph pairs
  came out flat instead of 3x. Identity mapping is the fix; the
  measured 3x growth is pinned in tests/test_scale_curve.py.)
  `n_chars` is recomputed (the source invariant n_chars =
  length(text) holds);
- `embeddings.embedding` in tile t is rotated by t positions (norms
  and within-tile geometry preserved; cross-tile cosine structure
  decorrelated);
- timestamps are copied verbatim: same time window at 3x density,
  which is what a larger SF means for window/as-of/decimal-sum
  queries (the q358/q35/q179/q288 scale-sensitive class);
- all other attribute columns are copied verbatim, so every tile
  carries exactly the driver's value distributions.

Arrow schemas are asserted byte-identical to the source tables.

    python tools/make_scale_fixture.py                # -> testdata_local/sf0.3
    python tools/make_scale_fixture.py OUTDIR [TILES]

Output is gitignored (regenerate on demand, ~10 s); a manifest JSON
with row counts and this provenance is written next to the tables.
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
KEY_STRIDE = 10**9

# per-table bigint key columns that shift by tile * KEY_STRIDE
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DOMAIN_TABLES = ("region", "nation")
TABLES = list(DOMAIN_TABLES) + list(KEY_COLS)


def _perturb_text(text: str, tile: int) -> str:
    from zlib import crc32  # deterministic, unlike PYTHONHASHSEED hash()

    off = (tile - 1) % 4
    return " ".join(
        f"{w}~{tile}" if crc32(w.encode()) % 4 == off else w
        for w in text.split(" ")
    )


def _tile_table(name: str, src: pa.Table, tile: int) -> pa.Table:
    if tile == 0:
        return src
    out = src
    for col in KEY_COLS[name]:
        i = out.schema.get_field_index(col)
        shifted = pc.add(out.column(col), pa.scalar(tile * KEY_STRIDE, pa.int64()))
        out = out.set_column(i, out.schema.field(i), shifted.cast(out.schema.field(i).type))
    if name == "documents":
        texts = [_perturb_text(t, tile) for t in out.column("text").to_pylist()]
        ti = out.schema.get_field_index("text")
        out = out.set_column(ti, out.schema.field(ti), pa.array(texts, out.schema.field(ti).type))
        ni = out.schema.get_field_index("n_chars")
        out = out.set_column(
            ni,
            out.schema.field(ni),
            pa.array([len(t) for t in texts], out.schema.field(ni).type),
        )
    if name == "embeddings":
        vecs = [v[tile:] + v[:tile] for v in out.column("embedding").to_pylist()]
        ei = out.schema.get_field_index("embedding")
        out = out.set_column(
            ei, out.schema.field(ei), pa.array(vecs, out.schema.field(ei).type)
        )
    return out


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_local",
        "sf0.3",
    )
    tiles = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    os.makedirs(out_dir, exist_ok=True)
    manifest: dict = {
        "source": SRC,
        "tiles": tiles,
        "key_stride": KEY_STRIDE,
        "provenance": "deterministic tiling of the driver sf0.1 fixture; "
        "see tools/make_scale_fixture.py docstring",
        "tables": {},
    }
    for name in TABLES:
        src = pq.read_table(f"{SRC}/{name}.parquet")
        if name in DOMAIN_TABLES:
            combined = src
        else:
            parts = [_tile_table(name, src, t) for t in range(tiles)]
            combined = pa.concat_tables(parts)
        assert combined.schema.equals(src.schema), name
        pq.write_table(combined, f"{out_dir}/{name}.parquet")
        manifest["tables"][name] = {
            "rows": combined.num_rows,
            "src_rows": src.num_rows,
        }
        print(f"{name}: {src.num_rows} -> {combined.num_rows}")
    with open(f"{out_dir}/MANIFEST.json", "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"wrote {out_dir}")


if __name__ == "__main__":
    main()
