"""Unit tests for the r09 domain-rollup + cross-snapshot versioning
family (operators/domains.py, operators/versioning.py) — constructed
corpora with known duplication/edit structure, exact expected values.
Oracle parity at sf0.001/sf0.01 runs separately via test_oracle_parity.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F

from etl_demos_spark.operators.domains import (
    host_chunk_stats,
    host_dedup_rollup,
    host_mirror_pairs,
)
from etl_demos_spark.operators.versioning import churn_rollup, snapshot_chunk_diff

# Long enough that CDC (w=3, mask=16, ~16-token expected chunk length)
# cuts several chunks; deterministic content.
_BODY = " ".join(f"tok{i} alpha{i % 7} beta{i % 11}" for i in range(60))
_OTHER = "wholly different page " + " ".join(f"gamma{i} d{i % 5}" for i in range(50))


def _toks(s: str) -> list[str]:
    return re.findall("[A-Za-z0-9]+", s.lower())


def test_host_rollup_accounting(spark):
    """Three hosts: A holds two copies of BODY (intra dup), B holds one
    copy of BODY (cross-host share with A) plus unique content, C is
    fully unique. Every count column is checkable by hand from the
    chunk multiset identities."""
    docs = spark.createDataFrame(
        [
            (1, "a.com", _BODY),
            (2, "a.com", _BODY),
            (3, "b.com", _BODY),
            (4, "b.com", _OTHER),
            (5, "c.com", "tiny page"),
        ],
        "doc_id long, source string, text string",
    )
    out = {r["host"]: r for r in host_dedup_rollup(docs).collect()}
    assert set(out) == {"a.com", "b.com", "c.com"}
    n_body = len(_toks(_BODY))

    a = out["a.com"]
    assert a["n_docs"] == 2
    # two identical docs: every fp has exactly 2 copies on A
    assert a["n_chunks"] == 2 * a["n_unique_fp"]
    assert a["intra_dup_chunks"] == a["n_unique_fp"]
    assert a["total_tokens"] == 2 * n_body
    assert a["intra_dup_tokens"] == n_body
    # BODY also lives on B: every one of A's fps is shared
    assert a["shared_fps"] == a["n_unique_fp"]
    assert a["shared_tokens"] == a["total_tokens"]
    assert a["shared_ratio"] == 1.0 and a["verdict"] == "drop"

    b = out["b.com"]
    assert b["n_docs"] == 2 and b["intra_dup_chunks"] == 0
    assert b["total_tokens"] == n_body + len(_toks(_OTHER))
    assert b["shared_tokens"] == n_body  # the BODY copy, not OTHER
    assert b["verdict"] == "drop"  # BODY dominates its token mass

    c = out["c.com"]
    assert c["shared_fps"] == 0 and c["shared_tokens"] == 0
    assert c["verdict"] == "keep"
    # chunk accounting ties back to host_chunk_stats exactly
    stats = host_chunk_stats(docs).collect()
    assert sum(r["n_copies"] for r in stats if r["host"] == "a.com") == a["n_chunks"]


def test_host_rollup_empty_host_reviewed(spark):
    """A host whose only doc has empty text has zero token evidence —
    it must surface as 'review' with NULL ratios, never 'keep'."""
    docs = spark.createDataFrame(
        [(1, "x.com", ""), (2, "y.com", _BODY)],
        "doc_id long, source string, text string",
    )
    out = {r["host"]: r for r in host_dedup_rollup(docs).collect()}
    x = out["x.com"]
    assert x["n_docs"] == 1 and x["total_tokens"] == 0
    assert x["shared_ratio"] is None and x["verdict"] == "review"


def test_host_mirror_pairs_containment(spark):
    """B mirrors A's entire content (plus nothing) → containment 1.0;
    C shares nothing → no pair row. min_shared filters singleton
    overlaps."""
    docs = spark.createDataFrame(
        [
            (1, "a.com", _BODY),
            (2, "a.com", _OTHER),
            (3, "b.com", _BODY),
            (4, "b.com", _OTHER),
            (5, "c.com", "nothing in common here at all"),
        ],
        "doc_id long, source string, text string",
    )
    rows = host_mirror_pairs(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["host_a"], r["host_b"]) == ("a.com", "b.com")
    assert r["n_fp_a"] == r["n_fp_b"] == r["shared_fps"]
    assert r["containment"] == 1.0 and r["jaccard"] == 1.0


def test_host_mirror_cap_excludes_universal_boilerplate(spark):
    """A chunk fingerprint on MORE hosts than max_hosts_per_fp is
    boilerplate, not mirror evidence — with the cap below the host
    count the pair set must be empty (and the default cap keeps it)."""
    docs = spark.createDataFrame(
        [(h, f"h{h}.com", _BODY) for h in range(5)],
        "doc_id long, source string, text string",
    )
    assert host_mirror_pairs(docs, max_hosts_per_fp=4).count() == 0
    full = host_mirror_pairs(docs, max_hosts_per_fp=None).collect()
    assert len(full) == 10  # C(5,2) — every host pair fully mirrored
    assert all(r["containment"] == 1.0 for r in full)


def test_snapshot_diff_statuses_and_accounting(spark):
    """One unchanged doc, one tail-edited doc, one deleted, one added.
    The tail edit must retain MOST tokens (CDC resync — only the final
    chunk region changes), and the Dice accounting identities must
    hold row by row."""
    old = spark.createDataFrame(
        [(1, _BODY), (2, _BODY + " trailing marker"), (3, _OTHER)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, _BODY),
            (2, _BODY + " trailing marker edited now"),
            (4, "brand new page " + _BODY),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in snapshot_chunk_diff(old, new).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["status"] == "unchanged" and out[1]["change_ratio"] == 0.0
    assert out[3]["status"] == "deleted" and out[3]["new_tokens"] == 0
    assert out[4]["status"] == "added" and out[4]["old_tokens"] == 0
    e = out[2]
    assert e["status"] == "modified"
    assert 0.0 < e["change_ratio"] < 0.3  # small edit, most chunks resync
    assert e["common_tokens"] > 0.7 * e["old_tokens"]
    for r in out.values():
        assert r["common_chunks"] <= min(r["old_chunks"], r["new_chunks"])
        assert r["common_tokens"] <= min(r["old_tokens"], r["new_tokens"])
        if r["old_tokens"] + r["new_tokens"] > 0:
            expect = round(
                1.0
                - 2.0 * r["common_tokens"] / (r["old_tokens"] + r["new_tokens"]),
                4,
            )
            assert abs(r["change_ratio"] - expect) < 1e-9


def test_snapshot_diff_multiset_semantics(spark):
    """Within-doc chunk MULTIPLICITY is respected: a doc holding two
    copies of a chunk in old and one in new retains exactly one copy's
    tokens (least of the multiplicities), not two."""
    body2 = _BODY + " " + _BODY
    old = spark.createDataFrame([(1, body2)], "doc_id long, text string")
    new = spark.createDataFrame([(1, _BODY)], "doc_id long, text string")
    r = snapshot_chunk_diff(old, new).collect()[0]
    assert r["status"] == "modified"
    assert r["common_chunks"] == r["new_chunks"]
    # every new-side chunk finds an old twin; nothing counted twice
    assert r["common_tokens"] == r["new_tokens"]
    assert r["old_tokens"] >= 2 * r["common_tokens"] - 5  # boundary chunks may differ


def test_churn_rollup_identities(spark):
    """added + retained == new tokens and removed + retained == old
    tokens, per (dim, status) group; dims joined on id."""
    old = spark.createDataFrame(
        [(1, _BODY), (2, _OTHER)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, _BODY + " appended words here"), (3, "fresh " + _OTHER)],
        "doc_id long, text string",
    )
    diff = snapshot_chunk_diff(old, new)
    dims = spark.createDataFrame(
        [(1, "s1"), (2, "s1"), (3, "s2")], "doc_id long, source string"
    )
    rows = churn_rollup(diff, dims, "source", dims_id_col="doc_id").collect()
    assert {(r["source"], r["status"]) for r in rows} == {
        ("s1", "modified"),
        ("s1", "deleted"),
        ("s2", "added"),
    }
    per_id = {r["id"]: r for r in diff.collect()}
    for r in rows:
        ids = {"modified": [1], "deleted": [2], "added": [3]}[r["status"]]
        assert r["tokens_added"] == sum(
            per_id[i]["new_tokens"] - per_id[i]["common_tokens"] for i in ids
        )
        assert r["tokens_removed"] == sum(
            per_id[i]["old_tokens"] - per_id[i]["common_tokens"] for i in ids
        )
        assert r["tokens_retained"] == sum(per_id[i]["common_tokens"] for i in ids)


def test_churn_rollup_rejects_misshapen_dims(spark):
    """dims id is named, never positional: a (source, doc_id) frame
    must raise, not silently rename the dimension to the join key and
    return an empty join (ADVICE r9)."""
    import pytest

    old = spark.createDataFrame([(1, _BODY)], "doc_id long, text string")
    new = spark.createDataFrame([(1, _BODY)], "doc_id long, text string")
    diff = snapshot_chunk_diff(old, new)
    swapped = spark.createDataFrame(
        [("s1", 1)], "source string, doc_id long"
    )
    with pytest.raises(ValueError, match="no id column"):
        churn_rollup(diff, swapped, "source")
    with pytest.raises(ValueError, match="no dimension column"):
        churn_rollup(
            diff,
            spark.createDataFrame([(1,)], "doc_id long"),
            "source",
            dims_id_col="doc_id",
        )
