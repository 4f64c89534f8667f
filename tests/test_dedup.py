"""Dedup operators vs sequential brute-force oracles."""

import numpy as np
import pyarrow as pa
import ray

from mapchete_xarray_ray.collect import arrow_block_refs

from mapchete_xarray_ray.stages.dedup import (
    candidate_pairs_from_bands,
    hamming64,
    jaccard,
    minhash_signature,
    minhash_stage,
    simhash64,
    simhash_stage,
)


def _collect(ds) -> pa.Table:
    tabs = [ray.get(r) for r in arrow_block_refs(ds)]
    tabs = [t for t in tabs if t.num_columns > 0]
    return pa.concat_tables(tabs) if tabs else pa.table({})


def _neardup_corpus():
    """Deterministic corpus with planted near-dups and exact dups."""
    rng = np.random.default_rng(99)
    vocab = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    texts, ids = [], []
    for i in range(40):
        words = [vocab[int(rng.integers(len(vocab)))] for _ in range(60)]
        texts.append(" ".join(words))
        ids.append(i)
    # planted near-dups: copy with 3 word substitutions (J ~ 0.85+)
    for j, src in enumerate([0, 5, 10, 15]):
        words = texts[src].split()
        for pos in (7, 23, 41):
            words[pos] = vocab[(pos + j) % len(vocab)]
        texts.append(" ".join(words))
        ids.append(100 + j)
    # one exact dup
    texts.append(texts[3])
    ids.append(200)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _oracle_pairs(tbl, threshold):
    ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if jaccard(texts[i], texts[j]) >= threshold:
                out.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    return out


def test_minhash_lsh_finds_planted_neardups():
    tbl = _neardup_corpus()
    bands = ray.data.from_arrow(tbl).map_batches(minhash_stage,
                                                 batch_format="pyarrow")
    cands = _collect(bands.groupby(["band_id", "band_hash"]).map_groups(
        candidate_pairs_from_bands, batch_format="pyarrow"))
    cand_pairs = set(zip(cands.column("id_a").to_pylist(),
                         cands.column("id_b").to_pylist()))
    texts = dict(zip(tbl.column("doc_id").to_pylist(),
                     tbl.column("text").to_pylist()))
    verified = {(a, b) for a, b in cand_pairs
                if jaccard(texts[a], texts[b]) >= 0.5}
    want = _oracle_pairs(tbl, 0.5)
    # high-similarity pairs must all be caught (fixed hashes -> this is
    # deterministic, not flaky); verified set must be a subset of truth
    assert verified <= want
    planted = {(0, 100), (5, 101), (10, 102), (15, 103), (3, 200)}
    assert planted <= verified
    assert verified == want  # at J>=0.5 the banding catches everything planted


def test_minhash_signature_properties():
    s1 = minhash_signature("the quick brown fox jumps over the lazy dog today")
    s2 = minhash_signature("the quick brown fox jumps over the lazy dog today")
    assert (s1 == s2).all()
    assert s1.shape == (64,)
    # near-identical texts share most signature slots
    s3 = minhash_signature("the quick brown fox jumps over the lazy cat today")
    assert (s1 == s3).mean() > 0.3


def test_simhash_blocking_finds_small_hamming():
    tbl = _neardup_corpus()
    rows = _collect(ray.data.from_arrow(tbl).map_batches(
        simhash_stage, batch_format="pyarrow"))
    # distributed blocking: pairs sharing any 16-bit chunk
    import collections

    buckets = collections.defaultdict(set)
    for did, sig, cid, cval in zip(rows.column("doc_id").to_pylist(),
                                   rows.column("sig").to_pylist(),
                                   rows.column("chunk_id").to_pylist(),
                                   rows.column("chunk_val").to_pylist()):
        buckets[(cid, cval)].add((did, sig))
    cand = set()
    for members in buckets.values():
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                cand.add((members[i], members[j]))
    found = {(a[0], b[0]) for a, b in cand
             if hamming64(np.array([a[1]]), np.array([b[1]]))[0] <= 3}
    # sequential oracle: all pairs with hamming <= 3 (blocking guarantees
    # recall for <=3 over 4 chunks by pigeonhole)
    ids = tbl.column("doc_id").to_pylist()
    sigs = {i: np.uint64(simhash64(t))
            for i, t in zip(ids, tbl.column("text").to_pylist())}
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = hamming64(np.array([sigs[ids[i]]], dtype=np.uint64),
                          np.array([sigs[ids[j]]], dtype=np.uint64))[0]
            if d <= 3:
                want.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    norm_found = {(min(a, b), max(a, b)) for a, b in found}
    assert norm_found == want
    assert (3, 200) in want  # the exact dup has hamming 0


def test_queries_dedup_and_neardup_run(sf_dir):
    from mapchete_xarray_ray.pipelines.queries import REGISTRY

    q_dedup_exact = REGISTRY["dedup_exact"][0]
    q_simhash = REGISTRY["simhash"][0]
    q_minhash_neardup = REGISTRY["minhash_neardup"][0]

    d = q_dedup_exact(sf_dir)
    assert d.num_rows == 500  # all sf0.001 texts are distinct
    assert set(d.column_names) == {"doc_id", "n_dups"}
    s = q_simhash(sf_dir)
    assert s.num_rows == 500
    t = q_minhash_neardup(sf_dir)
    assert t.num_rows >= 0  # word-salad corpus may or may not have near-dups


def test_batch_minhash_equals_per_doc():
    from mapchete_xarray_ray.stages.dedup import batch_minhash_signatures

    tbl = _neardup_corpus()
    texts = tbl.column("text").to_pylist() + ["", "one two", "a b c d"]
    got = batch_minhash_signatures(texts)
    want = np.stack([minhash_signature(t) for t in texts])
    np.testing.assert_array_equal(got, want)


def test_batch_simhash_equals_per_doc():
    from mapchete_xarray_ray.stages.dedup import batch_simhash64

    tbl = _neardup_corpus()
    texts = tbl.column("text").to_pylist() + ["", "one", "a b"]
    got = batch_simhash64(texts)
    want = np.array([simhash64(t) for t in texts], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_bucketed_pairs_equal_per_group_pairs():
    from mapchete_xarray_ray.stages.dedup import candidate_pairs_bucketed

    tbl = _neardup_corpus()
    bands = minhash_stage(tbl)
    # per-group reference
    import collections

    buckets = collections.defaultdict(set)
    for did, bid, bh in zip(bands.column("doc_id").to_pylist(),
                            bands.column("band_id").to_pylist(),
                            bands.column("band_hash").to_pylist()):
        buckets[(bid, bh)].add(did)
    want = set()
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                want.add((ms[i], ms[j]))
    got_t = candidate_pairs_bucketed(bands, ("band_id", "band_hash"))
    got = set(zip(got_t.column("id_a").to_pylist(),
                  got_t.column("id_b").to_pylist()))
    assert got == want


def test_connected_components_vs_union_find():
    from mapchete_xarray_ray.stages.dedup import connected_components

    rng = np.random.default_rng(17)
    # random sparse graph over 200 nodes incl. a long chain
    a = rng.integers(0, 200, 150)
    b = rng.integers(0, 200, 150)
    chain = np.arange(300, 330)
    a = np.concatenate([a, chain[:-1]])
    b = np.concatenate([b, chain[1:]])
    pairs = pa.table({"id_a": pa.array(a, pa.int64()),
                      "id_b": pa.array(b, pa.int64())})
    got = dict(zip(connected_components(pairs).column("doc_id").to_pylist(),
                   connected_components(pairs).column("cluster_id").to_pylist()))

    # oracle: union-find
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    for x, y in zip(a.tolist(), b.tolist()):
        union(x, y)
    want = {n: find(n) for n in parent}
    assert got == want
    # chain collapses to its head
    assert got[329] == 300


def test_connected_components_long_chain_converges():
    """Chains far longer than the round budget converge via the
    pointer-doubling contraction (regression: 40-node chain used to
    split into multiple clusters silently)."""
    from mapchete_xarray_ray.stages.dedup import connected_components

    n = 500
    a = np.arange(n - 1, dtype=np.int64)
    b = np.arange(1, n, dtype=np.int64)
    out = connected_components(pa.table({"id_a": pa.array(a), "id_b": pa.array(b)}))
    assert set(out.column("cluster_id").to_pylist()) == {0}
    assert out.num_rows == n


# --- n-gram Jaccard (PPJoin) ---------------------------------------------


def _ngram_oracle(tbl, tau=0.5):
    """Brute-force exact word-3-gram Jaccard over gram STRINGS."""
    from mapchete_xarray_ray.stages.dedup import ngram_grams

    ids = tbl.column("doc_id").to_pylist()
    sets = [ngram_grams(t) for t in tbl.column("text").to_pylist()]
    out = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i]) + len(sets[j]) - inter
            if 2 * inter >= union:
                out[(min(ids[i], ids[j]), max(ids[i], ids[j]))] = inter / union
    return out


def _ngram_corpus():
    """Planted near-dups plus short/empty edge docs."""
    tbl = _neardup_corpus()
    extra = pa.table({
        "doc_id": pa.array([300, 301, 302, 303], pa.int64()),
        "text": pa.array(["one two", "one two", "", "solo"], pa.string()),
    })
    return pa.concat_tables([tbl, extra])


def test_ngram_jaccard_exact_vs_bruteforce(tmp_path):
    """The full distributed PPJoin pipeline finds EVERY pair with
    J >= 0.5 and the exact Jaccard value — including <3-word docs
    (whole text as one gram) and the empty doc."""
    import pyarrow.parquet as pq

    from mapchete_xarray_ray.pipelines.queries import REGISTRY

    tbl = _ngram_corpus()
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = REGISTRY["ngram_jaccard"][0](str(tmp_path))
    want = _ngram_oracle(tbl)
    found = {
        (a, b): j
        for a, b, j in zip(got.column("id_a").to_pylist(),
                           got.column("id_b").to_pylist(),
                           got.column("jaccard").to_pylist())
    }
    assert set(found) == set(want)
    for k, v in want.items():
        assert abs(found[k] - v) < 1e-12
    # the planted near-dups and both short-doc pairs are in there
    for pair in [(0, 100), (5, 101), (10, 102), (15, 103), (3, 200),
                 (300, 301)]:
        assert pair in found
    assert found[(3, 200)] == 1.0 and found[(300, 301)] == 1.0


def test_ngram_prefix_completeness():
    """Property: after df-ordered prefix selection, every qualifying
    pair (J >= tau) still shares at least one gram in BOTH prefixes —
    the AllPairs/PPJoin candidate-completeness invariant."""
    from mapchete_xarray_ray.stages.dedup import (
        doc_gram_stage,
        gram_df_attach,
        ngram_prefix_select,
    )

    tbl = _ngram_corpus()
    exploded = doc_gram_stage(tbl)
    with_df = gram_df_attach(exploded)  # single bucket: all postings
    for tau in (0.5, 0.8):
        prefix = ngram_prefix_select(with_df, tau=tau)
        pref = {}
        for d, g in zip(prefix.column("doc_id").to_pylist(),
                        prefix.column("gram_hash").to_pylist()):
            pref.setdefault(d, set()).add(g)
        from mapchete_xarray_ray.stages.dedup import ngram_grams

        ids = tbl.column("doc_id").to_pylist()
        sets = [ngram_grams(t) for t in tbl.column("text").to_pylist()]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(sets[i] & sets[j])
                union = len(sets[i]) + len(sets[j]) - inter
                if union and inter / union >= tau:
                    assert pref[ids[i]] & pref[ids[j]], (ids[i], ids[j])


def test_ppjoin_filters_never_drop_qualifying_pairs():
    """The length + positional filters in ppjoin_pairs_bucketed keep
    every qualifying pair (they only prune impossible ones)."""
    from mapchete_xarray_ray.stages.dedup import (
        doc_gram_stage,
        gram_df_attach,
        ngram_prefix_select,
        ppjoin_pairs_bucketed,
    )

    tbl = _ngram_corpus()
    prefix = ngram_prefix_select(gram_df_attach(doc_gram_stage(tbl)),
                                 tau=0.5)
    cands = ppjoin_pairs_bucketed(prefix, tau=0.5)
    got = set(zip(cands.column("id_a").to_pylist(),
                  cands.column("id_b").to_pylist()))
    assert set(_ngram_oracle(tbl, 0.5)) <= got


def test_fnv1a64_matches_scalar_including_long_tokens():
    """The flat-bytes vectorized FNV-1a equals the byte-sequential
    definition for every token, including tokens past the long-token
    cutoff (which take the per-token scalar path) — and a pathological
    whitespace-free token must not blow up memory (no padded matrix)."""
    import random

    from mapchete_xarray_ray.stages.dedup import (
        _FNV_LONG_TOKEN,
        _fnv1a64_scalar,
        fnv1a64,
    )

    random.seed(11)
    toks = ["", "a", "hello world"[:5], "Z" * (_FNV_LONG_TOKEN + 7)]
    toks += ["".join(chr(random.randint(32, 126))
                     for _ in range(random.choice([0, 1, 4, 30, 200, 1500])))
             for _ in range(300)]
    got = fnv1a64(toks)
    want = np.array([np.uint64(_fnv1a64_scalar(t.encode())) for t in toks])
    assert (got == want).all()


def test_sql_whitespace_class_matches_str_split():
    """The SQL twins' whitespace class must split exactly like Python
    ``str.split()`` on every ASCII input — including \\x1c-\\x1f, which
    Python treats as whitespace (the parity domain the SimHash /
    fingerprint / n-gram twins document)."""
    import random

    import duckdb

    con = duckdb.connect()
    random.seed(5)
    cases = ["a\x1cb c", "\x1d\x1e\x1f", " lead\ttrail ", ""]
    cases += ["".join(chr(random.randint(1, 127))
                      for _ in range(random.randint(0, 40)))
              for _ in range(200)]
    for s in cases:
        got = con.execute(
            "SELECT list_filter(regexp_split_to_array(?, "
            "'[ \t\n\x0b\f\r\x1c-\x1f]+'), w -> w <> '')", [s]).fetchone()[0]
        assert got == s.split(), repr(s)


def test_connected_components_ds_forced_distributed_matches_fast_path():
    """The distributed label-propagation rounds (small_cutoff=0) and
    the adaptive in-memory path produce identical clusters."""
    from mapchete_xarray_ray.stages.dedup import connected_components_ds

    rng = np.random.default_rng(17)
    # chains + stars + isolated pairs, ids sparse
    pairs = []
    base = 0
    for L in (2, 3, 7, 15):
        ids = (rng.permutation(400)[:L] + base * 1000).astype(np.int64)
        pairs += [(min(a, b), max(a, b)) for a, b in zip(ids[:-1], ids[1:])]
        base += 1
    a = pa.array([p[0] for p in pairs], pa.int64())
    b = pa.array([p[1] for p in pairs], pa.int64())
    ds = ray.data.from_arrow(pa.table({"id_a": a, "id_b": b}))
    dist = _collect(connected_components_ds(ds, small_cutoff=0))
    fast = _collect(connected_components_ds(
        ray.data.from_arrow(pa.table({"id_a": a, "id_b": b}))))
    key = lambda t: sorted(zip(t.column("doc_id").to_pylist(),
                               t.column("cluster_id").to_pylist()))
    assert key(dist) == key(fast)
    assert dist.num_rows > 0


def test_connected_components_ds_self_loops_survive_both_paths():
    """A self-loop pair (a, a) must register node a as its own
    singleton cluster on BOTH the adaptive in-memory path and the
    distributed rounds — the small path used to silently drop it."""
    from mapchete_xarray_ray.stages.dedup import connected_components_ds

    t = pa.table({"id_a": pa.array([5, 1], pa.int64()),
                  "id_b": pa.array([5, 2], pa.int64())})
    want = [(1, 1), (2, 1), (5, 5)]
    for cutoff in (0, 1 << 21):
        got = _collect(connected_components_ds(
            ray.data.from_arrow(t), small_cutoff=cutoff))
        assert sorted(zip(got.column("doc_id").to_pylist(),
                          got.column("cluster_id").to_pylist())) == want, cutoff


def test_dedup_canonical_keeps_cluster_minima(tmp_path):
    """The end-to-end exact near-dup corpus dedup keeps every doc
    except non-minimal members of a Jaccard >= 0.5 cluster."""
    import pyarrow.parquet as pq

    from mapchete_xarray_ray.pipelines.queries import REGISTRY

    tbl = _ngram_corpus()
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = set(REGISTRY["dedup_canonical"][0](str(tmp_path))
              .column("doc_id").to_pylist())
    # brute-force: union-find over the oracle pair set
    pairs = list(_ngram_oracle(tbl))
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    all_ids = set(tbl.column("doc_id").to_pylist())
    drop = {x for x in parent if find(x) != x}
    assert got == all_ids - drop
    # planted dups are dropped, their sources kept
    for src, dup in [(0, 100), (5, 101), (3, 200), (300, 301)]:
        assert src in got and dup not in got


def test_degenerate_bucket_valve_bounds_identical_flood():
    """The cluster-representative valve: a band segment flooded with
    identical documents must expand to O(n) star pairs + a clique over
    content representatives only — never the O(n^2) clique — while
    segments at/below the cap are bit-identical to the plain path."""
    from mapchete_xarray_ray.stages.dedup import candidate_pairs_bucketed

    n = 10_000
    # one band segment: n copies of content A, 3 of content B, 1 of C
    ids = np.arange(n + 4, dtype=np.int64)
    ch = np.concatenate([np.full(n, 111), [222, 222, 222], [333]])
    seg = pa.table({
        "band_id": pa.array(np.zeros(n + 4, dtype=np.int64)),
        "band_hash": pa.array(np.full(n + 4, 77, dtype=np.int64)),
        "doc_id": pa.array(ids),
        "chash": pa.array(ch.astype(np.int64)),
    })
    got = candidate_pairs_bucketed(seg, ("band_id", "band_hash"),
                                   chash_col="chash", max_segment=64)
    a = got.column("id_a").to_pylist()
    b = got.column("id_b").to_pylist()
    pairs = set(zip(a, b))
    # stars: rep 0 -> 1..n-1 copies of A; rep n -> n+1, n+2 copies of B
    want = {(0, i) for i in range(1, n)}
    want |= {(n, n + 1), (n, n + 2)}
    # rep clique: (0, n), (0, n+3), (n, n+3)
    want |= {(0, n), (0, n + 3), (n, n + 3)}
    assert pairs == want
    assert len(a) == (n - 1) + 2 + 3  # linear, not ~5e7
    assert all(x < y for x, y in pairs)

    # below the cap: identical output with and without the valve
    small = seg.slice(n - 2, 6)  # 2 A-copies, 3 B, 1 C
    plain = candidate_pairs_bucketed(small, ("band_id", "band_hash"))
    valved = candidate_pairs_bucketed(small, ("band_id", "band_hash"),
                                      chash_col="chash", max_segment=64)
    assert plain.equals(valved)


def test_minhash_flood_clusters_match_uncapped(sf_dir):
    """End-to-end CC-preservation proof obligation: forcing the valve
    (max_segment=2, every multi-member segment takes the representative
    path) must leave the connected-components output identical to the
    uncapped chain, and an identical-doc flood must still land in one
    cluster. Runs the REAL distributed chain both ways."""
    from mapchete_xarray_ray.pipelines.queries import minhash_pairs_pipeline
    from mapchete_xarray_ray.stages.dedup import connected_components_ds

    base = _neardup_corpus()
    flood_ids = np.arange(500, 560, dtype=np.int64)
    flood_txt = [base.column("text").to_pylist()[0]] * 60
    tbl = pa.table({
        "doc_id": pa.concat_arrays(
            [base.column("doc_id").combine_chunks(),
             pa.array(flood_ids, pa.int64())]),
        "text": pa.concat_arrays(
            [base.column("text").combine_chunks().cast(pa.string()),
             pa.array(flood_txt, pa.string())]),
    })

    def clusters(max_segment):
        docs = ray.data.from_arrow(tbl).repartition(4)
        pairs = minhash_pairs_pipeline(docs, max_segment=max_segment)
        cc = _collect(connected_components_ds(pairs.materialize()))
        return sorted(zip(cc.column("doc_id").to_pylist(),
                          cc.column("cluster_id").to_pylist()))

    capped = clusters(2)
    uncapped = clusters(10 ** 9)
    assert capped == uncapped
    lab = dict(capped)
    # doc 0's identical flood (and its planted near-dup 100) share one cluster
    assert len({lab[int(i)] for i in flood_ids} | {lab[0], lab[100]}) == 1
