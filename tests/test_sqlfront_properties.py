"""Model-based property test for the SQL front-end's MERGE executor.

Hypothesis composes random merge STATEMENTS — clause subsets, orders,
and conditions drawn from the shapes the grammar supports — renders
them to statement TEXT, parses + executes through ``apply_merge``, and
compares against a dict-model interpreter implementing the MERGE
standard directly (first-match-wins per row class). The same strategy
that found real bugs in the MOR command sequences (test_mor_properties)
applied to the newest executor.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tb_lakehouse_enhanced_spark.sqlfront import (
    MergeCardinalityError, apply_merge, parse_merge,
)

# condition forms: (SQL text fragment, model predicate)
# model rows are (t_v, s_v) ints; None side absent
_MATCHED_CONDS = [
    (None, lambda tv, sv: True),
    ("tgt.v != src.v", lambda tv, sv: tv != sv),
    ("src.v >= 5", lambda tv, sv: sv >= 5),
    ("tgt.v + src.v > 10", lambda tv, sv: tv + sv > 10),
]
_NMBS_CONDS = [
    (None, lambda tv: True),
    ("tgt.v < 4", lambda tv: tv < 4),
]
_INS_CONDS = [
    (None, lambda sv: True),
    ("src.v % 2 = 0", lambda sv: sv % 2 == 0),
]

_matched_clause = st.tuples(st.sampled_from(range(len(_MATCHED_CONDS))),
                            st.sampled_from(["update", "update_star",
                                             "delete"]))
_nmbs_clause = st.tuples(st.sampled_from(range(len(_NMBS_CONDS))),
                         st.sampled_from(["update", "delete"]))
_ins_clause = st.sampled_from(range(len(_INS_CONDS)))

_tables = st.tuples(
    st.dictionaries(st.integers(0, 9), st.integers(0, 9), max_size=8),
    st.dictionaries(st.integers(0, 9), st.integers(0, 9), max_size=8),
)


def _render(matched, nmbs, insert_idx):
    parts = ["MERGE INTO db.t AS tgt USING s AS src ON tgt.k = src.k"]
    for ci, action in matched:
        cond = _MATCHED_CONDS[ci][0]
        head = "WHEN MATCHED" + (f" AND {cond}" if cond else "")
        act = {"update": "UPDATE SET tgt.v = src.v + 100",
               "update_star": "UPDATE SET *",
               "delete": "DELETE"}[action]
        parts.append(f"{head} THEN {act}")
    for ci, action in nmbs:
        cond = _NMBS_CONDS[ci][0]
        head = "WHEN NOT MATCHED BY SOURCE" + (f" AND {cond}" if cond else "")
        act = "UPDATE SET tgt.v = tgt.v + 50" if action == "update" \
            else "DELETE"
        parts.append(f"{head} THEN {act}")
    if insert_idx is not None:
        cond = _INS_CONDS[insert_idx][0]
        head = "WHEN NOT MATCHED" + (f" AND {cond}" if cond else "")
        parts.append(f"{head} THEN INSERT (k, v) VALUES (src.k, src.v)")
    return "\n".join(parts)


def _model(tgt: dict, src: dict, matched, nmbs, insert_idx) -> dict:
    out = {}
    for k, tv in tgt.items():
        if k in src:
            sv = src[k]
            fired = None
            for ci, action in matched:
                if _MATCHED_CONDS[ci][1](tv, sv):
                    fired = action
                    break
            if fired == "update":
                out[k] = sv + 100
            elif fired == "update_star":
                out[k] = sv
            elif fired == "delete":
                pass
            else:
                out[k] = tv
        else:
            fired = None
            for ci, action in nmbs:
                if _NMBS_CONDS[ci][1](tv):
                    fired = action
                    break
            if fired == "update":
                out[k] = tv + 50
            elif fired == "delete":
                pass
            else:
                out[k] = tv
    if insert_idx is not None:
        for k, sv in src.items():
            if k not in tgt and _INS_CONDS[insert_idx][1](sv):
                out[k] = sv
    return out


@settings(max_examples=25, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(tables=_tables,
       matched=st.lists(_matched_clause, max_size=3),
       nmbs=st.lists(_nmbs_clause, max_size=2),
       insert_idx=st.one_of(st.none(), _ins_clause))
def test_merge_statements_match_model(spark, tables, matched, nmbs,
                                      insert_idx):
    tgt_d, src_d = tables
    if not matched and not nmbs and insert_idx is None:
        return                                  # grammar requires a clause
    sql = _render(matched, nmbs, insert_idx)
    spec = parse_merge(sql)
    tgt = spark.createDataFrame(
        [(k, v) for k, v in sorted(tgt_d.items())] or [(None, None)],
        "k int, v int").filter("k IS NOT NULL")
    src = spark.createDataFrame(
        [(k, v) for k, v in sorted(src_d.items())] or [(None, None)],
        "k int, v int").filter("k IS NOT NULL")
    got = {r["k"]: r["v"]
           for r in apply_merge(tgt, src, spec).collect()}
    assert got == _model(tgt_d, src_d, matched, nmbs, insert_idx), sql


def test_merge_duplicate_source_keys_raise_for_modifying_clauses(spark):
    tgt = spark.createDataFrame([(1, 1)], "k int, v int")
    src = spark.createDataFrame([(1, 2), (1, 3)], "k int, v int")
    spec = parse_merge(
        "MERGE INTO db.t AS tgt USING s AS src ON tgt.k = src.k "
        "WHEN MATCHED THEN UPDATE SET tgt.v = src.v")
    with pytest.raises(MergeCardinalityError):
        apply_merge(tgt, src, spec)


# ---------------------------------------------------------- parser fuzz ----
#
# Whitespace/comment mutations of the reference statement shapes must
# parse to the SAME spec: the parser normalizes lexically, so layout
# and inline comments are semantically inert. Pure-Python (no Spark).

_REF_MERGE = (
    "MERGE INTO silver.address AS tgt USING src_address AS src "
    "ON tgt.address_id = src.address_id AND tgt._tf_valid_to IS NULL "
    "WHEN MATCHED AND ( tgt.city != src.city OR tgt.postal_code != "
    "src.postal_code ) THEN UPDATE SET tgt._tf_valid_to = "
    "current_timestamp(), tgt._tf_update_date = current_timestamp() "
    "WHEN NOT MATCHED BY SOURCE AND tgt._tf_valid_to IS NULL THEN "
    "UPDATE SET tgt._tf_valid_to = current_timestamp() "
    "WHEN NOT MATCHED THEN INSERT (address_id, city) "
    "VALUES (src.address_id, src.city)")


@settings(max_examples=80, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(seed=st.randoms(use_true_random=False))
def test_parser_invariant_under_layout_mutations(seed):
    from tb_lakehouse_enhanced_spark.sqlfront import parse_merge
    want = parse_merge(_REF_MERGE)
    toks = _REF_MERGE.split(" ")
    mutated = []
    for tok in toks:
        mutated.append(tok)
        r = seed.random()
        if r < 0.15:
            mutated.append("\n  ")
        elif r < 0.25:
            mutated.append("\t")
        elif r < 0.32:
            mutated.append("-- a comment; WHEN MATCHED THEN noise\n")
        else:
            mutated.append(" ")
    got = parse_merge("".join(mutated))
    assert got == want


# ------------------------------------------------ fused close+insert -------
#
# The round-7 SCD2 fusion (apply_merge_fused_pair) must be
# row-for-row equivalent to running the two statements sequentially —
# across guard shapes, clause conditions, multi-version targets
# (several rows per key, open + closed), sources matching zero/one/
# many target rows, and NULL source keys.

_F_MATCHED_CONDS = [None, "tgt.v != src.v", "src.v >= 5"]
_F_INS_CONDS = [None, "src.v % 2 = 0"]


def _render_pair(m_cond, ins_cond, with_nmbs):
    on = "tgt.k = src.k AND tgt.vt IS NULL"
    close = ["MERGE INTO db.t AS tgt USING s AS src ON " + on,
             "WHEN MATCHED" + (f" AND {m_cond}" if m_cond else "")
             + " THEN UPDATE SET tgt.vt = 1, tgt.closed_v = src.v"]
    if with_nmbs:
        close.append("WHEN NOT MATCHED BY SOURCE AND tgt.vt IS NULL "
                     "THEN UPDATE SET tgt.vt = 1")
    ins = ["MERGE INTO db.t AS tgt USING s AS src ON " + on,
           "WHEN NOT MATCHED" + (f" AND {ins_cond}" if ins_cond else "")
           + " THEN INSERT (k, v, vt, closed_v) "
           "VALUES (src.k, src.v, NULL, NULL)"]
    return "\n".join(close), "\n".join(ins)


@settings(max_examples=25, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(tgt_rows=st.lists(
           st.tuples(st.integers(0, 5), st.integers(0, 9),
                     st.sampled_from([None, 1])), max_size=10),
       src_d=st.dictionaries(st.integers(0, 5), st.integers(0, 9),
                             max_size=6),
       null_key_src=st.booleans(),
       m_idx=st.sampled_from(range(len(_F_MATCHED_CONDS))),
       ins_idx=st.sampled_from(range(len(_F_INS_CONDS))),
       with_nmbs=st.booleans())
def test_fused_pair_equals_sequential(spark, tgt_rows, src_d,
                                      null_key_src, m_idx, ins_idx,
                                      with_nmbs):
    from tb_lakehouse_enhanced_spark.sqlfront import (
        _fusable_close_insert, apply_merge_fused_pair,
    )
    close_sql, ins_sql = _render_pair(_F_MATCHED_CONDS[m_idx],
                                      _F_INS_CONDS[ins_idx], with_nmbs)
    s1, s2 = parse_merge(close_sql), parse_merge(ins_sql)
    assert _fusable_close_insert(s1, s2)
    src_rows = sorted(src_d.items())
    if null_key_src:
        src_rows.append((None, 7))
    tgt = spark.createDataFrame(
        [(k, v, vt, None) for k, v, vt in tgt_rows] or
        [(None, None, None, None)],
        "k int, v int, vt int, closed_v int").filter(
        "v IS NOT NULL OR k IS NOT NULL OR vt IS NOT NULL"
        if tgt_rows else "FALSE")
    src = spark.createDataFrame(
        src_rows or [(None, None)], "k int, v int").filter(
        "TRUE" if src_rows else "FALSE")
    seq = apply_merge(apply_merge(tgt, src, s1, check_cardinality=False),
                      src, s2, check_cardinality=False)
    fused = apply_merge_fused_pair(tgt, src, s1, s2)
    key = lambda r: tuple((x is None, x) for x in r)
    assert sorted(map(tuple, fused.collect()), key=lambda t: key(t)) \
        == sorted(map(tuple, seq.collect()), key=lambda t: key(t)), \
        (close_sql, ins_sql, tgt_rows, src_rows)


@settings(max_examples=20, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(ids=st.lists(st.integers(-50, 50), max_size=6),
       start=st.integers(-10, 10),
       step=st.integers(-4, 4).filter(lambda x: x != 0),
       n_new=st.integers(0, 5))
def test_assign_identity_matches_domain_model(spark, ids, start, step,
                                              n_new):
    """_assign_identity against the identity-domain model: generated
    values are the next n slots of ``start + k*step`` strictly past
    the high-water mark (MIN-tracking for negative steps, slot counter
    never below zero), existing ids untouched."""
    from tb_lakehouse_enhanced_spark.sqlfront import _assign_identity
    tgt = spark.createDataFrame(
        [(i, v) for i, v in enumerate(ids)] or [(None, None)],
        "ord int, id bigint")
    if not ids:
        tgt = tgt.filter("FALSE")
    new = spark.createDataFrame(
        [(100 + i, None) for i in range(n_new)] or [(None, None)],
        "ord int, id bigint")
    if not n_new:
        new = new.filter("FALSE")
    got = {r["ord"]: r["id"]
           for r in _assign_identity(tgt.unionByName(new), tgt, "id",
                                     ["ord"], start, step).collect()}
    if not ids:
        k0 = 0
    elif step > 0:
        k0 = max(0, (max(ids) - start) // step + 1)
    else:
        k0 = max(0, (start - min(ids)) // (-step) + 1)
    expect = {i: v for i, v in enumerate(ids)}
    expect.update({100 + i: start + (k0 + i) * step
                   for i in range(n_new)})
    assert got == expect, (ids, start, step, n_new, k0)
