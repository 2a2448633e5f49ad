"""Entity resolution: blocking recall, verification threshold,
hot-block chunking equivalence, singleton labeling."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from accounting_etl_spark.operators.entity_resolution import (
    match_pairs,
    resolve_entities,
)


def _two_token_keys():
    # key per half: an edit inside one half leaves the other intact
    toks = F.split(F.col("name"), " ")
    return [
        F.concat_ws(" ", toks[0], toks[1]),
        F.concat_ws(" ", toks[2], toks[3]),
    ]


@pytest.fixture(scope="module")
def vendors(spark):
    rows = [
        # one entity: exact dupe + last-char typo in token 2
        (0, "acme tools north east"),
        (1, "acme tools north east"),
        (2, "acme tool north east"),
        # second entity: typo in the SECOND half (first key intact)
        (10, "globex pumps west coast"),
        (11, "globex pumps west copst"),
        # near but over threshold (two edits from 10)
        (20, "globex pumps east const"),
        # singleton sharing no block with anyone
        (30, "initech filters south bay"),
    ]
    return spark.createDataFrame(rows, ["id", "name"])


def test_match_pairs_threshold_and_blocking(spark, vendors):
    got = {
        (r.id_a, r.id_b)
        for r in match_pairs(
            vendors, keys=_two_token_keys(), max_dist=1
        ).collect()
    }
    assert got == {(0, 1), (0, 2), (1, 2), (10, 11)}


def test_resolve_entities_labels(spark, vendors):
    out = {
        r.id: (r.entity_id, r.cluster_size, r.is_canonical)
        for r in resolve_entities(
            vendors, keys=_two_token_keys(), max_dist=1
        ).collect()
    }
    assert out[0] == (0, 3, True)
    assert out[1] == (0, 3, False)
    assert out[2] == (0, 3, False)
    assert out[10] == (10, 2, True)
    assert out[11] == (10, 2, False)
    # over-threshold and unblocked records stay singletons
    assert out[20] == (20, 1, True)
    assert out[30] == (30, 1, True)
    assert len(out) == 7


def test_hot_block_chunking_equivalence(spark):
    # 60 records named identically: one hot block; tiny max_block
    # must produce the same entity labeling as the unchunked path
    rows = [(i, "dup corp main street") for i in range(60)]
    rows += [(100, "lone star side road")]
    df = spark.createDataFrame(rows, ["id", "name"])
    small = resolve_entities(
        df, keys=_two_token_keys(), max_dist=1, max_block=7
    )
    big = resolve_entities(
        df, keys=_two_token_keys(), max_dist=1, max_block=10_000
    )
    assert sorted(map(tuple, small.collect())) == sorted(
        map(tuple, big.collect())
    )
    got = {r.id: r.entity_id for r in small.collect()}
    assert all(got[i] == 0 for i in range(60))
    assert got[100] == 100


def test_single_edit_recall_across_key_regions(spark):
    # an edit ANYWHERE in a two-key record still pairs: first-half
    # edits share key2, second-half edits share key1
    base = "alpha beta gamma delta"
    rows = [(0, base)]
    edited = []
    k = 1
    for pos in range(len(base)):
        if base[pos] == " ":
            continue  # space edits change tokenization of both keys
        edited.append((k, base[:pos] + base[pos + 1 :]))
        k += 1
    df = spark.createDataFrame(rows + edited, ["id", "name"])
    pairs = match_pairs(df, keys=_two_token_keys(), max_dist=1)
    withbase = {
        r.id_b for r in pairs.filter(F.col("id_a") == 0).collect()
    }
    assert withbase == {i for i, _ in edited}


def test_empty_keys_rejected(spark, vendors):
    with pytest.raises(ValueError):
        match_pairs(vendors, keys=[], max_dist=1)


def test_length_subblocking_keeps_single_edit_recall(spark):
    """r10 length sub-blocking: a deletion pair has lengths L and
    L-1, which can straddle a width-2d bucket boundary in ONE scheme
    but never both (boundaries of the two schemes interleave at
    distance d). Sweep L across several parities/boundaries — every
    single-deletion pair must still be found."""
    rows = []
    expected = set()
    for j, pad in enumerate(range(6)):  # name lengths spanning buckets
        base = f"acme corp unit{'x' * pad} east"
        a, b = 100 * j, 100 * j + 1
        rows += [(a, base), (b, base[:-1])]  # delete last char
        expected.add((a, b))
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {
        (r.id_a, r.id_b)
        for r in match_pairs(
            df, keys=_two_token_keys(), max_dist=1
        ).collect()
    }
    assert expected <= got


def test_cluster_sizes_from_name_counts_on_duplicate_heavy_input(spark):
    # r12: cluster_size is summed on the per-name count table instead
    # of aggregating the record-level join output — on a duplicate-
    # heavy input (many records per identical name) the sizes must
    # still count RECORDS, not names
    rows = (
        [(i, "acme tools north east") for i in range(5)]
        + [(10, "acme tool north east")]          # 1-edit link
        + [(20, "zenith valves south bay"), (21, "zenith valves south bay")]
    )
    recs = spark.createDataFrame(rows, ["id", "name"])
    out = {
        r.id: (r.entity_id, r.cluster_size, r.is_canonical)
        for r in resolve_entities(
            recs, keys=_two_token_keys(), max_dist=1
        ).collect()
    }
    # entity 0 = 5 identical-name records + the typo record = 6
    for i in [0, 1, 2, 3, 4, 10]:
        assert out[i] == (0, 6, i == 0)
    for i in [20, 21]:
        assert out[i] == (20, 2, i == 20)
    assert len(out) == 8
