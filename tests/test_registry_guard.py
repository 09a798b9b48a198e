"""Registry-duplicate guard (round-11 verdict item 3): round 10
briefly carried seven duplicate SPECS entries, one of which silently
SHADOWED q221's implementation via a key collision (caught and removed
in-session, commit 07369df). This makes that incident class fail CI:

1. STATIC (ast): replay queries.py's module-level SPECS mutations in
   source order — the initial dict literal, the _FINAL_ORDER
   renumbering rebuild, and every ``SPECS[<const>] = `` append — and
   assert no key is ever assigned twice within its live namespace
   (Python dicts and dict literals both shadow silently, so neither
   the runtime dict nor a set() check can see the overwrite).
2. STATIC: no other mutation mechanism exists (non-constant subscript
   keys, SPECS.update/setdefault, augmented assigns) — anything the
   replay in (1) cannot track is itself a failure.
3. RUNTIME: no two entries share the same Spark callable (a dupe
   entry that survives renaming still points at the same fn).
4. RUNTIME: normalized oracle-SQL text collisions must be exactly the
   pinned intentional set — streaming queries verified against their
   batch-equivalence oracle BY THEOREM (q38≡q151 incremental MinHash,
   q41≡q206 exact dedup, ...). A new accidental copy-paste of an
   existing oracle fails here.
5. RUNTIME (duckdb, sf0.001): full result-set fingerprint collisions
   (sorted columns + canonicalized sorted rows) must be exactly the
   pinned set — catches the subtler dupe whose SQL text was edited
   but whose results are byte-identical (the round-10 second-KS /
   second-Benford class). Measured 2026-08-15: the only collisions
   are the six intentional streaming/batch (or source/transform)
   pairs below.

Deliberately re-adding a duplicate (e.g. ``SPECS["q221_..."] = ``
a second time, or a re-worded copy of an existing oracle) fails
tests 1/4/5 respectively; verified by mutation when this landed.
"""

from __future__ import annotations

import ast
import collections
import hashlib
import os
import re

from etl_geonet_quakes_spark.queries import SPECS

_QUERIES_PY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "etl_geonet_quakes_spark",
    "queries.py",
)

# Oracle SQL shared verbatim between a batch query and the streaming
# (or source-tier) query whose output equals it by theorem — the
# equivalence IS the point of the streaming entry, so the shared
# text is intentional, not padding. Frozen: additions need a reason.
INTENTIONAL_SQL_SHARES = {
    frozenset({"q02_quake_pipeline", "q187_quake_stream_source"}),
    frozenset({"q04_stream_tumbling", "q81_time_window_tumbling"}),
    frozenset({"q06_stream_dedup", "q07_stream_dedup_watermark"}),
    frozenset({"q38_dedup_minhash_lsh", "q151_stream_dedup_minhash"}),
    frozenset({"q41_dedup_exact", "q206_stream_exact_dedup"}),
}

# Result-set fingerprint collisions at sf0.001: the five SQL shares
# above plus q08/q50 (streaming session windows vs the batch
# sessionization query — different SQL, same sessions by theorem).
INTENTIONAL_RESULT_SHARES = INTENTIONAL_SQL_SHARES | {
    frozenset({"q08_stream_sessions", "q50_sessionization"}),
}


def _module_statements():
    with open(_QUERIES_PY) as f:
        return ast.parse(f.read()).body


def _final_order_new_names(stmts) -> list[str]:
    for node in stmts:
        target = None
        if isinstance(node, ast.Assign) and len(node.targets) == 1:
            target = node.targets[0]
        elif isinstance(node, ast.AnnAssign) and node.value is not None:
            target = node.target
        if isinstance(target, ast.Name) and target.id == "_FINAL_ORDER":
            pairs = ast.literal_eval(node.value)
            return [new for _, new in pairs]
    raise AssertionError("_FINAL_ORDER literal not found in queries.py")


def test_specs_keys_assigned_exactly_once():
    """Replay every module-level SPECS mutation in source order; a
    key assigned while already live is the q221-shadowing bug."""
    stmts = _module_statements()
    live: set[str] = set()
    n_mutations = 0
    for node in stmts:
        if isinstance(node, ast.Assign):
            targets = node.targets
        elif isinstance(node, ast.AnnAssign) and node.value is not None:
            targets = [node.target]  # SPECS: dict[...] = {...}
        else:
            continue
        for t in targets:
            if isinstance(t, ast.Name) and t.id == "SPECS":
                n_mutations += 1
                if isinstance(node.value, ast.Dict):
                    keys = [k.value for k in node.value.keys]
                    assert all(isinstance(k, str) for k in keys)
                    dup = [k for k, c in collections.Counter(keys).items() if c > 1]
                    assert not dup, f"duplicate keys in SPECS dict literal: {dup}"
                    live = set(keys)
                elif isinstance(node.value, ast.DictComp):
                    # the renumbering rebuild: live namespace becomes
                    # _FINAL_ORDER's new names (uniqueness asserted
                    # inline in queries.py; re-asserted here)
                    new = _final_order_new_names(stmts)
                    assert len(set(new)) == len(new)
                    live = set(new)
                else:
                    raise AssertionError(
                        f"unrecognized SPECS rebind at line {node.lineno}: "
                        "extend the guard before adding new mutation forms"
                    )
            elif (
                isinstance(t, ast.Subscript)
                and isinstance(t.value, ast.Name)
                and t.value.id == "SPECS"
            ):
                n_mutations += 1
                assert isinstance(t.slice, ast.Constant) and isinstance(
                    t.slice.value, str
                ), f"non-constant SPECS key at line {node.lineno}"
                key = t.slice.value
                assert key not in live, (
                    f"SPECS[{key!r}] assigned twice (line {node.lineno}) — "
                    "this silently shadows the first implementation "
                    "(the round-10 q221 incident)"
                )
                live.add(key)
    assert live == set(SPECS), "static replay disagrees with runtime SPECS"
    assert n_mutations >= len(SPECS) // 2  # sanity: replay saw the registry


def test_no_untracked_specs_mutation_mechanisms():
    """The static replay above only sees Assign statements; forbid
    every mutation form it cannot track."""
    stmts = _module_statements()
    for node in ast.walk(ast.Module(body=stmts, type_ignores=[])):
        if isinstance(node, ast.AugAssign) or (
            # AnnAssign on the SPECS *name* is the tracked initial dict
            # literal; an annotated subscript write would be untracked
            isinstance(node, ast.AnnAssign)
            and isinstance(node.target, ast.Subscript)
        ):
            t = node.target
            hits_specs = (
                isinstance(t, ast.Name) and t.id == "SPECS"
            ) or (
                isinstance(t, ast.Subscript)
                and isinstance(t.value, ast.Name)
                and t.value.id == "SPECS"
            )
            assert not hits_specs, f"untracked SPECS mutation at line {node.lineno}"
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute):
            if (
                isinstance(node.func.value, ast.Name)
                and node.func.value.id == "SPECS"
                and node.func.attr in ("update", "setdefault", "pop", "__setitem__")
            ):
                raise AssertionError(
                    f"SPECS.{node.func.attr} at line {node.lineno}: "
                    "use a plain SPECS[key] = assignment so the guard sees it"
                )


def test_no_two_entries_share_a_spark_fn():
    by_fn = collections.defaultdict(list)
    for name, spec in SPECS.items():
        by_fn[spec.fn].append(name)
    shared = [v for v in by_fn.values() if len(v) > 1]
    assert not shared, f"entries sharing one Spark callable: {shared}"


def test_oracle_sql_text_collisions_are_pinned():
    by_sql = collections.defaultdict(list)
    for name, spec in SPECS.items():
        if spec.oracle:
            by_sql[re.sub(r"\s+", " ", spec.oracle).strip().lower()].append(name)
    got = {frozenset(v) for v in by_sql.values() if len(v) > 1}
    assert got == INTENTIONAL_SQL_SHARES, (
        "oracle SQL text collisions changed; new copy-paste dupes? "
        f"unexpected={got - INTENTIONAL_SQL_SHARES} "
        f"missing={INTENTIONAL_SQL_SHARES - got}"
    )


def test_oracle_result_fingerprint_collisions_are_pinned():
    """Full duckdb sweep at sf0.001 (~2 min): two entries whose
    oracle RESULTS are byte-identical but aren't a pinned
    streaming/batch pair are presumed duplicates."""
    import duckdb

    from etl_geonet_quakes_spark.io import TABLES

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    by_fp = collections.defaultdict(list)
    for name, spec in SPECS.items():
        if not spec.oracle:
            continue
        res = con.sql(spec.oracle)
        cols = sorted(res.columns)
        idx = [res.columns.index(c) for c in cols]
        canon = sorted(repr(tuple(r[i] for i in idx)) for r in res.fetchall())
        h = hashlib.md5(
            ("|".join(cols) + "\n" + "\n".join(canon)).encode()
        ).hexdigest()
        by_fp[h].append(name)
    got = {frozenset(v) for v in by_fp.values() if len(v) > 1}
    assert got == INTENTIONAL_RESULT_SHARES, (
        "oracle result fingerprint collisions changed: "
        f"unexpected={got - INTENTIONAL_RESULT_SHARES} "
        f"missing={INTENTIONAL_RESULT_SHARES - got}"
    )
