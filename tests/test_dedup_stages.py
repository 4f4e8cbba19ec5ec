"""Dedup operator tests over small in-memory datasets."""

import pyarrow as pa
import pytest


@pytest.fixture()
def docs_ds(ray_session):
    import ray.data

    rows = [
        (0, "the quick brown fox jumps over the lazy dog and runs far away today"),
        (1, "the quick brown fox jumps over the lazy dog and runs far away today"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat and runs far away today"),  # near dup of 0
        (3, "completely unrelated text about astronomy planets stars and galaxies tonight"),
        (4, "another unique document mentioning databases indexes transactions and logs"),
    ]
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
            }
        )
    )


def test_exact_dedup(docs_ds):
    import hashlib

    from textpipe_ray.stages.dedup import dedup_exact

    def key(batch):
        k = [hashlib.md5(t.encode()).hexdigest() for t in batch.column("text").to_pylist()]
        return batch.append_column("k", pa.array(k))

    out = dedup_exact(docs_ds.map_batches(key, batch_format="pyarrow"), "k", "doc_id")
    ids = sorted(out.to_pandas()["doc_id"])
    assert ids == [0, 2, 3, 4]  # row 1 collapsed into row 0


def test_near_dup_minhash(docs_ds):
    from textpipe_ray.stages.dedup import near_dup_minhash

    pairs = near_dup_minhash(docs_ds, threshold=0.7).to_pandas()
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 1) in got  # exact dup
    assert (0, 2) in got or (1, 2) in got  # near dup
    assert not any(3 in p or 4 in p for p in got)


def test_minhash_simhash_batches(docs_ds):
    from textpipe_ray.stages.dedup import minhash_batch, simhash_batch

    t = docs_ds.map_batches(minhash_batch, batch_format="pyarrow").map_batches(
        simhash_batch, batch_format="pyarrow"
    ).to_pandas()
    assert len(t["minhash"][0]) == 128
    assert list(t["minhash"][0]) == list(t["minhash"][1])  # exact dups → same sig
    assert t["simhash"][0] == t["simhash"][1]


def test_near_dup_embeddings(ray_session):
    import numpy as np
    import ray.data

    rng = np.random.RandomState(0)
    base = rng.standard_normal(64)
    vecs = [base, base + rng.standard_normal(64) * 0.01, rng.standard_normal(64), rng.standard_normal(64)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": list(range(4)),
                "embedding": pa.array([v.astype("float32").tolist() for v in vecs], pa.list_(pa.float32())),
            }
        )
    )
    from textpipe_ray.stages.dedup import near_dup_embeddings

    pairs = near_dup_embeddings(ds, threshold=0.95).to_pandas()
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 1) in got
    assert all(p == (0, 1) for p in got)


def test_simhash_neardup(docs_ds):
    from textpipe_ray.stages.dedup import near_dup_simhash

    out = near_dup_simhash(docs_ds, max_hamming=8).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    # exact dup pair must be found at hamming 0; near dup at small hamming
    assert (0, 1) in pairs
    ham = dict(zip(zip(out["id_a"], out["id_b"]), out["hamming"]))
    assert ham[(0, 1)] == 0
    assert (0, 2) in pairs and ham[(0, 2)] <= 8
    # unrelated docs must not pair
    assert (3, 4) not in pairs


def test_shingle_jaccard_exact(docs_ds):
    from textpipe_ray.stages.dedup import shingle_jaccard_pairs

    out = shingle_jaccard_pairs(docs_ds, k=3, threshold=0.5).to_pandas()
    pairs = {(a, b): j for a, b, j in zip(out["id_a"], out["id_b"], out["jac"])}
    assert pairs[(0, 1)] == 1.0  # identical docs
    # near dup: 14 tokens -> 12 shingles each; differing word breaks 3
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert (3, 4) not in pairs


def test_ngram_jaccard_oracle_parity(ray_session):
    """The exact-Jaccard Ray plan matches the DuckDB inverted-index SQL
    bit-for-bit at sf0.001."""
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    m = importlib.import_module("__ray_entry__")
    from textpipe_ray.pipelines.compare import compare, run_oracle

    sf = "/root/testdata/sf0.001"
    c = compare(m.queries()["q_ngram_jaccard"](sf), run_oracle(sf, m.oracle_sql()["q_ngram_jaccard"]))
    assert c["rows_match"] and c["cols_match"] and c["values_match"], c


def test_pair_clusters_union_find():
    import pandas as pd

    from textpipe_ray.stages.dedup import pair_clusters

    pairs = pd.DataFrame({"id_a": [1, 2, 10, 20], "id_b": [2, 3, 11, 21]})
    roots = pair_clusters(pairs)
    assert roots[1] == roots[2] == roots[3] == 1  # chain merges to min id
    assert roots[10] == roots[11] == 10
    assert roots[20] == roots[21] == 20


def test_drop_near_dups_end_to_end(docs_ds):
    from textpipe_ray.stages.dedup import drop_near_dups

    out = drop_near_dups(docs_ds, threshold=0.5, num_bands=32).to_pandas()
    ids = sorted(out["doc_id"])
    # 1 is an exact dup of 0; 2 is a near dup of 0 → only 0 survives,
    # plus the two unrelated docs
    assert ids == [0, 3, 4], ids


def test_drop_near_dups_no_duplicates(ray_session):
    """A duplicate-free corpus must pass through unchanged (empty
    droplist regression: previously crashed with IndexError)."""
    import pyarrow as pa

    import ray.data

    from textpipe_ray.stages.dedup import drop_near_dups

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "completely distinct first document about astronomy tonight",
                    "second unique text mentioning databases and transactions",
                    "third text about cooking pasta with fresh tomatoes",
                ],
            }
        )
    )
    out = drop_near_dups(ds, threshold=0.5).to_pandas()
    assert sorted(out["doc_id"]) == [0, 1, 2]


def test_simhash_max_hamming_zero(docs_ds):
    """max_hamming=0 (exact-fingerprint dedup) must not overflow the
    64-bit band key."""
    from textpipe_ray.stages.dedup import near_dup_simhash

    out = near_dup_simhash(docs_ds, max_hamming=0).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (0, 1) in pairs  # exact dup pair
    assert all(h == 0 for h in out["hamming"])


def test_shingle_jaccard_rejects_wide_ids(ray_session):
    """doc ids >= 2^31 would corrupt the packed pair key — must raise."""
    import pyarrow as pa

    import pytest as _pytest
    import ray.data

    from textpipe_ray.stages.dedup import shingle_jaccard_pairs

    ds = ray.data.from_arrow(
        pa.table({"doc_id": [1 << 32], "text": ["some words repeated some words"]})
    )
    with _pytest.raises(Exception) as ei:
        shingle_jaccard_pairs(ds).take_all()
    assert "31 bits" in str(ei.value)


def test_near_dup_minhash_matches_inprocess_reference(ray_session):
    """The distributed plan (band explode → bucket groupby → pair dedup
    → co-partitioned signature joins → verify) must produce EXACTLY the
    pair set an independent single-process reference computes from the
    same kernels — the regression gate for the join-based verify path
    (no driver-side signature broadcast)."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from textpipe_ray.functions.minhash import (
        lsh_band_hashes,
        minhash_signature_shingles,
    )
    from textpipe_ray.stages.dedup import near_dup_minhash

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"])
    threshold, num_bands, shingle = 0.7, 16, 5

    # independent reference: plain dict-based LSH + brute verify
    ids = t.column("doc_id").to_pylist()
    sigs = {i: minhash_signature_shingles(x or "", shingle) for i, x in zip(ids, t.column("text").to_pylist())}
    buckets: dict[tuple, list] = {}
    for i in ids:
        for b, h in enumerate(lsh_band_hashes(sigs[i], num_bands)):
            buckets.setdefault((b, h), []).append(i)
    expected = {}
    for members in buckets.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                a, b = sorted((members[x], members[y]))
                j = float((sigs[a] == sigs[b]).mean())
                if j >= threshold:
                    expected[(a, b)] = j

    # BOTH verify strategies (broadcast when sigs fit, co-partitioned
    # join at scale) must agree with the reference exactly
    for mode in ("broadcast", "join"):
        got_df = near_dup_minhash(
            ray.data.from_arrow(t),
            threshold=threshold,
            num_bands=num_bands,
            shingle_size=shingle,
            verify_mode=mode,
        ).to_pandas()
        got = {
            (a, b): j for a, b, j in zip(got_df["id_a"], got_df["id_b"], got_df["jaccard_est"])
        }
        assert len(got_df) == len(got), mode  # each pair exactly once after dedup
        assert set(got) == set(expected), mode
        for k in expected:
            assert got[k] == expected[k], mode


def test_shingle_jaccard_sizes_distributed(ray_session):
    """The distributed per-doc shingle-size table + co-partitioned
    attach must reproduce an independent single-process computation of
    exact k-gram Jaccard, bit for bit."""
    import re

    import pyarrow.parquet as pq
    import ray.data

    from textpipe_ray.stages.dedup import SHINGLE_TOKEN_RE2, shingle_jaccard_pairs

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"])
    k, threshold = 3, 0.8
    tok = re.compile(SHINGLE_TOKEN_RE2)

    def shingles(text):
        ws = tok.findall((text or "").lower())
        return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}

    sh = {i: shingles(x) for i, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())}
    expected = {}
    items = sorted(sh)
    for x in range(len(items)):
        for y in range(x + 1, len(items)):
            a, b = items[x], items[y]
            inter = len(sh[a] & sh[b])
            if inter:
                j = inter / (len(sh[a]) + len(sh[b]) - inter)
                if j >= threshold:
                    expected[(a, b)] = j

    got_df = shingle_jaccard_pairs(
        ray.data.from_arrow(t), k=k, threshold=threshold
    ).to_pandas()
    got = {(a, b): j for a, b, j in zip(got_df["id_a"], got_df["id_b"], got_df["jac"])}
    assert set(got) == set(expected)
    for key in expected:
        assert got[key] == expected[key]


def test_pair_clusters_distributed_matches_union_find(ray_session):
    """Label propagation must produce exactly the driver union-find's
    deterministic min-id roots: chain + triangle + isolated pair."""
    import pandas as pd
    import pyarrow as pa

    import ray.data

    from textpipe_ray.stages.dedup import pair_clusters, pair_clusters_distributed

    # components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    pairs = pd.DataFrame(
        {
            "id_a": [1, 2, 3, 10, 10, 11, 20],
            "id_b": [2, 3, 4, 11, 12, 12, 21],
        }
    )
    want = pair_clusters(pairs)
    got_df = pair_clusters_distributed(
        ray.data.from_arrow(pa.Table.from_pandas(pairs)), num_partitions=4
    ).to_pandas()
    got = dict(zip(got_df["doc_id"], got_df["root"]))
    assert got == want


def test_drop_near_dups_modes_agree(ray_session):
    """driver union-find and distributed label-prop + anti-join must
    keep the identical survivor set."""
    import pyarrow.parquet as pq

    import ray.data

    from textpipe_ray.stages.dedup import drop_near_dups

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"])
    kw = dict(threshold=0.7, num_bands=16, shingle_size=5)
    a = sorted(
        drop_near_dups(ray.data.from_arrow(t), cluster_mode="driver", **kw).to_pandas()["doc_id"]
    )
    b = sorted(
        drop_near_dups(ray.data.from_arrow(t), cluster_mode="distributed", **kw).to_pandas()[
            "doc_id"
        ]
    )
    assert a == b and len(a) > 0


def test_incremental_index_dedup(ray_session, tmp_path):
    """write_minhash_index + near_dup_against_index: a new snapshot's
    near-dups of the INDEXED corpus are found without recomputing the
    old corpus, and the pair set matches a fresh full near_dup_minhash
    run restricted to cross-corpus pairs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data

    from textpipe_ray.stages.dedup import (
        near_dup_against_index,
        near_dup_minhash,
        write_minhash_index,
    )

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"])
    old = t.slice(0, 400)
    # new snapshot: 100 fresh docs re-using texts of docs 0-49 (planted
    # cross-corpus dups) + 50 unrelated; ids offset to stay disjoint
    texts = t.column("text").to_pylist()
    new_t = pa.table(
        {
            "doc_id": [10_000 + i for i in range(100)],
            "text": texts[:50] + texts[400:450],
        }
    )
    kw = dict(num_bands=16, threshold=0.7, shingle_size=5)

    write_minhash_index(ray.data.from_arrow(old), str(tmp_path / "idx"), **{k: v for k, v in kw.items() if k != "threshold"})
    inc = near_dup_against_index(
        ray.data.from_arrow(new_t), str(tmp_path / "idx"), **kw
    ).to_pandas()
    got = {(a, b) for a, b in zip(inc["new_id"], inc["index_id"])}

    # reference: full joint run, keep only new-vs-old pairs
    joint = near_dup_minhash(
        ray.data.from_arrow(pa.concat_tables([old, new_t])), **kw
    ).to_pandas()
    want = set()
    for a, b in zip(joint["id_a"], joint["id_b"]):
        lo, hi = (a, b) if a < b else (b, a)
        if lo < 10_000 <= hi:
            want.add((hi, lo))  # (new_id, index_id)
    assert got == want
    # every planted text-reuse pair must be recovered
    assert all((10_000 + i, i) in got for i in range(50))


def test_incremental_index_append_lifecycle(ray_session, tmp_path):
    """The production snapshot loop: index snapshot A, dedup B against
    it, APPEND B (band parameters come from the index's own meta, never
    the caller), then dedup C against A∪B — C's pairs must equal a full
    joint run restricted to C-vs-(A∪B), including C-vs-B pairs that
    only the appended half can produce."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data

    from textpipe_ray.stages.dedup import (
        append_minhash_index,
        near_dup_against_index,
        near_dup_minhash,
        write_minhash_index,
    )

    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    texts = t.column("text").to_pylist()
    a = pa.table({"doc_id": list(range(100)), "text": texts[:100]})
    # B reuses 20 of A's texts; C reuses 15 of A's and 15 of B's fresh ones
    b = pa.table(
        {
            "doc_id": [1_000 + i for i in range(60)],
            "text": texts[:20] + texts[100:140],
        }
    )
    c = pa.table(
        {
            "doc_id": [2_000 + i for i in range(40)],
            "text": texts[50:65] + texts[100:115] + texts[200:210],
        }
    )
    kw = dict(num_bands=16, threshold=0.7, shingle_size=5)
    idx = str(tmp_path / "idx")

    from textpipe_ray.stages.dedup import compute_minhash_sigs

    write_minhash_index(ray.data.from_arrow(a), idx, num_bands=16, shingle_size=5)
    # production loop: B's signatures computed ONCE, shared between the
    # dedup call and the ingest call
    sig_b = compute_minhash_sigs(ray.data.from_arrow(b), shingle_size=5).materialize()
    near_dup_against_index(None, idx, sig_ds=sig_b, **kw).materialize()
    append_minhash_index(None, idx, sig_ds=sig_b)

    inc = near_dup_against_index(ray.data.from_arrow(c), idx, **kw).to_pandas()
    got = {(x, y) for x, y in zip(inc["new_id"], inc["index_id"])}

    joint = near_dup_minhash(
        ray.data.from_arrow(pa.concat_tables([a, b, c])), **kw
    ).to_pandas()
    want = set()
    for x, y in zip(joint["id_a"], joint["id_b"]):
        lo, hi = (x, y) if x < y else (y, x)
        if hi >= 2_000 and lo < 2_000:
            want.add((hi, lo))
    assert got == want
    # the planted C-vs-B reuse pairs prove the APPENDED half is live
    assert any(2_000 <= x and 1_000 <= y < 2_000 for x, y in got)
    # every planted C-vs-A reuse pair recovered
    assert all((2_000 + i, 50 + i) in got for i in range(15))


def test_incremental_index_meta_guard(ray_session, tmp_path):
    """An index whose band-hash kernel or build parameters differ from
    the query's must be REFUSED (a silent mismatch would return zero
    pairs — total recall collapse), and a missing marker (incompatible
    engine version / incomplete write) must be refused too."""
    import json

    import pyarrow as pa
    import pytest

    import ray.data

    from textpipe_ray.stages.dedup import near_dup_against_index, write_minhash_index

    old = pa.table({"doc_id": [0, 1], "text": ["aaaa bbbb cccc", "dddd eeee ffff"]})
    new = pa.table({"doc_id": [10_000], "text": ["aaaa bbbb cccc"]})
    idx = str(tmp_path / "idx")
    write_minhash_index(ray.data.from_arrow(old), idx, num_bands=16, shingle_size=5)

    # parameter mismatch: index built with 16 bands, queried with 32
    with pytest.raises(ValueError, match="num_bands"):
        near_dup_against_index(ray.data.from_arrow(new), idx, num_bands=32, shingle_size=5)

    # kernel mismatch: a pre-vectorization index must not be read
    meta_path = tmp_path / "idx" / "_meta.json"
    meta = json.loads(meta_path.read_text())
    meta["band_hash_kernel"] = "blake2b-per-row-v0"
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="band_hash_kernel"):
        near_dup_against_index(ray.data.from_arrow(new), idx, num_bands=16, shingle_size=5)

    # missing marker (old engine or incomplete write)
    meta_path.unlink()
    with pytest.raises(ValueError, match="_meta.json"):
        near_dup_against_index(ray.data.from_arrow(new), idx, num_bands=16, shingle_size=5)


def test_substring_dedup_removes_shared_run_keeps_keeper(ray_session, tmp_path):
    """q_substring_dedup semantics on planted data: a cross-document
    shared run is excised from the higher doc_id (window-covered core
    gone), fully retained by the min-doc_id keeper; internal repeats
    within one document and unique text are untouched."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from textpipe_ray.pipelines.queries import SPAN_W, q_substring_dedup

    shared = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "sparrows argue about breadcrumbs near the old stone fountain and "
        "a tired postman wheels his squeaking bicycle past the bakery "
        "window full of warm loaves on a grey tuesday morning in autumn"
    )
    # content-defined anchors fire with prob 1/SUB_GAP per position; at
    # this run length the miss probability is ~1e-10 and the outcome is
    # DETERMINISTIC given the content (it passed once → it always passes)
    assert len(shared) > 200
    uniq1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    uniq2 = "one two three four five six seven eight nine ten eleven twelve thirteen"
    internal = "repeat me repeat me repeat me repeat me repeat me repeat me repeat me"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [uniq1 + " " + shared, shared + " " + uniq2, internal],
                    pa.string(),
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = (
        q_substring_dedup(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    )
    # keeper (doc 1) untouched
    assert out.loc[1, "text"] == uniq1 + " " + shared
    assert out.loc[1, "removed_chars"] == 0
    # doc 2 lost the shared run's anchored core but kept its tail
    assert shared not in out.loc[2, "text"]
    assert uniq2 in out.loc[2, "text"]
    assert out.loc[2, "removed_chars"] >= SPAN_W
    assert out.loc[2, "n_banned_windows"] >= 1
    # internal-only repetition is NOT cross-document: untouched
    assert out.loc[3, "text"] == internal
    assert out.loc[3, "removed_chars"] == 0


def test_substring_dedup_keeper_protection_under_overlap(ray_session, tmp_path):
    """Overlapping duplicated runs with DIFFERENT keepers: chars covered
    by a window this document keeps must survive, even when a
    foreign-keeper run covers the same chars — otherwise the straddling
    windows' content would survive in NO document."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from textpipe_ray.pipelines.queries import SPAN_W, _sub_windows, q_substring_dedup

    rng = np.random.RandomState(11)
    words = ["w%03d" % i for i in rng.randint(0, 900, 90)]
    S = " ".join(words)  # ~450 chars, content-random
    CUT = 200
    # doc 0 shares S's head → keeper of every window fully inside [0, CUT)
    # doc 2 shares all of S  → windows straddling/after CUT are doc 1's own
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array([S[:CUT], S, "zz " + S], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = (
        q_substring_dedup(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    )
    # doc 0 keeps everything (it is the keeper of all its windows)
    assert out.loc[0, "text"] == S[:CUT]
    # doc 1 lost head content to doc 0's windows...
    assert out.loc[1, "removed_chars"] > 0
    # ...but every window doc 1 KEEPS (those extending past CUT, which
    # doc 0 cannot contain) must survive contiguously in doc 1
    codes = np.frombuffer(S.encode("utf-32-le"), dtype=np.uint32)
    starts, _ = _sub_windows(codes)
    own = [int(a) for a in starts if a + SPAN_W > CUT]
    assert own, "test needs at least one straddling/late window"
    for a in own:
        assert S[a : a + SPAN_W] in out.loc[1, "text"], a
    # doc 2 is keeper of nothing: its copy of S is eroded
    assert out.loc[2, "removed_chars"] > 0
    assert S not in out.loc[2, "text"]


def test_incremental_index_append_atomicity(ray_session, tmp_path):
    """A crashed append (generation data written, meta bump never
    committed) must be INVISIBLE to readers, and a retried append must
    overwrite the stale generation and commit it exactly once."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data

    from textpipe_ray.stages.dedup import (
        _write_index_data,
        append_minhash_index,
        compute_minhash_sigs,
        near_dup_against_index,
        write_minhash_index,
    )

    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    texts = t.column("text").to_pylist()
    a = pa.table({"doc_id": list(range(100)), "text": texts[:100]})
    b = pa.table({"doc_id": [1_000 + i for i in range(30)], "text": texts[100:130]})
    # C reuses 10 of A's texts and 10 of B's
    c = pa.table(
        {
            "doc_id": [2_000 + i for i in range(20)],
            "text": texts[:10] + texts[100:110],
        }
    )
    kw = dict(num_bands=16, threshold=0.7, shingle_size=5)
    idx = str(tmp_path / "idx")
    write_minhash_index(ray.data.from_arrow(a), idx, num_bands=16, shingle_size=5)

    # simulate the crash: generation 2's data lands, meta is never bumped
    sig_b = compute_minhash_sigs(ray.data.from_arrow(b), shingle_size=5).materialize()
    _write_index_data(sig_b, idx, 2, 16, 32)

    inc = near_dup_against_index(ray.data.from_arrow(c), idx, **kw).to_pandas()
    got = {(x, y) for x, y in zip(inc["new_id"], inc["index_id"])}
    assert got and all(y < 1_000 for _, y in got)  # B's half invisible

    # retry commits; now B's pairs appear exactly once
    append_minhash_index(None, idx, sig_ds=sig_b)
    inc2 = near_dup_against_index(ray.data.from_arrow(c), idx, **kw).to_pandas()
    got2 = {(x, y) for x, y in zip(inc2["new_id"], inc2["index_id"])}
    assert len(inc2) == len(got2)  # no duplicated pairs from the stale attempt
    assert got < got2
    assert all((2_000 + 10 + i, 1_000 + i) in got2 for i in range(10))


def test_bloom_save_load_merge_cross_run(ray_session, tmp_path):
    """The cross-RUN Bloom loop: build over snapshot A, save; a later
    run loads it, scans snapshot B (planted A-dups hit, fresh text has
    no false negatives by construction), ORs B's keys in and saves
    back; a third scan sees A∪B.  A kernel/geometry mismatch at load
    must be refused."""
    import json

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    import ray
    import ray.data

    from textpipe_ray.stages.dedup import (
        build_bloom,
        bloom_scan,
        load_bloom,
        merge_blooms,
        save_bloom,
    )

    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    texts = t.column("text").to_pylist()
    a = pa.table({"doc_id": list(range(50)), "text": texts[:50]})
    # B: 10 dups of A + 20 fresh
    b = pa.table(
        {"doc_id": [1000 + i for i in range(30)], "text": texts[:10] + texts[50:70]}
    )
    c = pa.table(
        {"doc_id": [2000 + i for i in range(20)], "text": texts[5:15] + texts[90:100]}
    )
    M, K = 1 << 20, 6
    path = str(tmp_path / "bloom.npz")

    ref_a = build_bloom(ray.data.from_arrow(a), m_bits=M, k=K)
    save_bloom(ref_a, path, M, K)

    # next run: load, scan B
    loaded = load_bloom(path, M, K)
    hits = (
        bloom_scan(ray.data.from_arrow(b), loaded, m_bits=M, k=K)
        .to_pandas()
        .set_index("doc_id")["bloom_hit"]
    )
    assert all(hits[1000 + i] for i in range(10))  # zero false negatives
    assert sum(hits) <= 10 + 2  # FP-bounded on the fresh 20

    # ingest B, save back, scan C against A∪B
    merged = merge_blooms(loaded, build_bloom(ray.data.from_arrow(b), m_bits=M, k=K))
    save_bloom(merged, path, M, K)
    hits_c = (
        bloom_scan(ray.data.from_arrow(c), load_bloom(path, M, K), m_bits=M, k=K)
        .to_pandas()
        .set_index("doc_id")["bloom_hit"]
    )
    # C's first 10 texts are A-or-B members (texts[5:15] ⊂ A)
    assert all(hits_c[2000 + i] for i in range(10))

    # geometry mismatch refused
    with pytest.raises(ValueError, match="m_bits"):
        load_bloom(path, M * 2, K)


def test_incremental_index_compaction(ray_session, tmp_path):
    """compact_minhash_index merges all generations into one (from the
    stored signatures — no re-shingling) with IDENTICAL query results,
    retires the old directories, and the index keeps accepting appends
    afterwards."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data

    from textpipe_ray.stages.dedup import (
        append_minhash_index,
        compact_minhash_index,
        near_dup_against_index,
        write_minhash_index,
    )

    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    texts = t.column("text").to_pylist()
    a = pa.table({"doc_id": list(range(80)), "text": texts[:80]})
    b = pa.table({"doc_id": [1000 + i for i in range(40)], "text": texts[80:120]})
    c = pa.table(
        {"doc_id": [2000 + i for i in range(20)], "text": texts[:10] + texts[80:90]}
    )
    d = pa.table({"doc_id": [3000 + i for i in range(10)], "text": texts[120:130]})
    kw = dict(num_bands=16, threshold=0.7, shingle_size=5)
    idx = str(tmp_path / "idx")

    write_minhash_index(ray.data.from_arrow(a), idx, num_bands=16, shingle_size=5)
    append_minhash_index(ray.data.from_arrow(b), idx)
    before = near_dup_against_index(ray.data.from_arrow(c), idx, **kw).to_pandas()
    pairs_before = {(x, y) for x, y in zip(before["new_id"], before["index_id"])}

    compact_minhash_index(idx)
    meta = json.loads(open(os.path.join(idx, "_meta.json")).read())
    assert meta["gens"] == [3]
    assert not os.path.exists(f"{idx}/sigs/gen=1") and not os.path.exists(
        f"{idx}/bands/gen=2"
    )
    after = near_dup_against_index(ray.data.from_arrow(c), idx, **kw).to_pandas()
    pairs_after = {(x, y) for x, y in zip(after["new_id"], after["index_id"])}
    assert pairs_before == pairs_after and len(pairs_after) >= 20

    # appends keep working post-compaction
    append_minhash_index(ray.data.from_arrow(d), idx)
    meta = json.loads(open(os.path.join(idx, "_meta.json")).read())
    assert meta["gens"] == [3, 4]

    # compacting a single-generation index is a no-op
    compact_minhash_index(idx)
    compact_minhash_index(idx)
    meta2 = json.loads(open(os.path.join(idx, "_meta.json")).read())
    assert len(meta2["gens"]) == 1


def test_bloom_geometry_validated_everywhere(ray_session):
    """Every consumer of a built filter must refuse a geometry mismatch
    -- an OR of same-shape bitmaps built under different k would
    succeed silently and then produce FALSE NEGATIVES at scan (probes
    of positions the builder never set), breaking the filter's one
    guarantee."""
    import pyarrow as pa
    import pytest

    import ray
    import ray.data

    from textpipe_ray.stages.dedup import bloom_scan, build_bloom, merge_blooms

    t = pa.table({"doc_id": [1, 2], "text": ["aa", "bb"]})
    M = 1 << 16
    ref_k6 = build_bloom(ray.data.from_arrow(t), m_bits=M, k=6)
    ref_k4 = build_bloom(ray.data.from_arrow(t), m_bits=M, k=4)

    # same m_bits, different k: merge task must raise
    with pytest.raises(Exception, match="incompatible"):
        ray.get(merge_blooms(ref_k6, ref_k4))
    # matching geometries merge fine and scan validates too
    merged = merge_blooms(ref_k6, build_bloom(ray.data.from_arrow(t), m_bits=M, k=6))
    ok = bloom_scan(ray.data.from_arrow(t), merged, m_bits=M, k=6).take_all()
    assert all(r["bloom_hit"] for r in ok)
    with pytest.raises(Exception, match="incompatible"):
        bloom_scan(ray.data.from_arrow(t), merged, m_bits=M, k=4).take_all()
    with pytest.raises(ValueError, match="at least one"):
        merge_blooms()


def test_lsh_recall_eval_row(ray_session):
    """q_lsh_recall: every exact word-3-gram near-dup pair must be an
    LSH candidate (recall ≥ the pipeline's 0.99 bar), and at the
    production estimate threshold the reported pairs must be clean."""
    from textpipe_ray.pipelines.queries import q_lsh_recall

    t = q_lsh_recall("/root/testdata/sf0.001").to_pandas()
    truth = t[t.in_truth]
    assert len(truth) > 0  # non-vacuous
    assert truth.in_cand.mean() >= 0.99
    # truth rows carry a real exact value; reported-only candidates carry -1
    assert (truth.exact_x1000 >= 800).all()
    assert (t.loc[~t.in_truth, "exact_x1000"] == -1).all()
    # pair canonical form
    assert (t.id_a < t.id_b).all()
