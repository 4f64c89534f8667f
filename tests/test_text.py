"""Text-analysis stages: token count, quality, langid, fingerprint."""

import numpy as np
import pyarrow as pa

from mapchete_xarray_ray.stages.text import (
    fingerprint_stage,
    langid_stage,
    quality_stage,
    token_count_stage,
)


def _batch(texts):
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def test_token_count():
    out = token_count_stage(_batch(["a b  c", "  x ", "one"]))
    assert out.column("n_tokens").to_pylist() == [3, 1, 1]


def test_quality_metrics():
    out = quality_stage(_batch(["Hi, there! 42 things."]))
    assert out.column("n_chars").to_pylist() == [21]
    assert out.column("n_tokens").to_pylist() == [4]
    assert out.column("n_punct").to_pylist() == [3]  # , ! .
    assert out.column("n_digits").to_pylist() == [2]


def test_langid_argmax_and_ties():
    out = langid_stage(_batch([
        "the cat and the dog of this to",          # en
        "der hund und die katze ist das",          # de
        "le chat et la vache dans les des",        # fr
        "zzz qqq www",                             # no hits -> unknown
        "the der",                                 # tie en/de -> de (smaller)
    ]))
    assert out.column("lang_pred").to_pylist() == ["en", "de", "fr", "unknown", "de"]


def test_fingerprint_oracle():
    texts = ["hello world", "", "a", "hello worlD"]
    out = fingerprint_stage(_batch(texts))
    got = out.column("fingerprint").to_pylist()

    # sequential oracle: plain python big-int polynomial mod 2^64
    def fp(t):
        acc = 0
        for byte in t.encode("utf-8"):
            acc = (acc * 257 + byte) % (1 << 64)
        return acc - (1 << 64) if acc >= (1 << 63) else acc  # as int64

    assert got == [fp(t) for t in texts]
    assert got[0] != got[3]  # case-sensitive


def test_fingerprint_deterministic_across_batches():
    t1 = fingerprint_stage(_batch(["abc", "def"]))
    t2 = fingerprint_stage(_batch(["def"]))
    assert t1.column("fingerprint").to_pylist()[1] == \
        t2.column("fingerprint").to_pylist()[0]


def test_fingerprint_large_string_offsets():
    """large_string columns carry int64 offsets; the zero-copy reader
    must branch on the type instead of assuming int32 (silent
    misdecode otherwise)."""
    texts = ["hello world", "", "abc", "x" * 1000]
    small = fingerprint_stage(_batch(texts))
    big = fingerprint_stage(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.large_string()),
    }))
    assert (small.column("fingerprint").to_pylist()
            == big.column("fingerprint").to_pylist())


def test_bpe_token_stage_matches_re_findall():
    """Byte-level run/lead-byte arithmetic == re.findall over str for
    the shared pattern, including unicode chars (one punct token per
    non-ASCII char) and empty/whitespace-only docs."""
    import re

    from mapchete_xarray_ray.stages.text import (
        BPE_TOKEN_PATTERN,
        bpe_token_stage,
    )

    texts = [
        "Hello, world! 42 times 3.14", "", "   \t\n", "abc123def",
        "café naïve — résumés",  # multibyte chars
        "a-b_c+d=e", "1234567890", "...!!!", "x",
    ]
    out = bpe_token_stage(_batch(texts))
    pat = re.compile(BPE_TOKEN_PATTERN)
    for i, t in enumerate(texts):
        toks = pat.findall(t)
        words = sum(1 for x in toks if x[0].isascii() and x[0].isalpha())
        nums = sum(1 for x in toks if x[0].isascii() and x[0].isdigit())
        assert out.column("n_tokens_bpe")[i].as_py() == len(toks), t
        assert out.column("n_words")[i].as_py() == words, t
        assert out.column("n_numbers")[i].as_py() == nums, t
        assert out.column("n_punct")[i].as_py() == len(toks) - words - nums, t


def test_tfidf_topk_vs_bruteforce(sf_dir):
    """The two-shuffle distributed tf-idf equals a sequential
    tokenize/tf/df/score/top-3 computation over the same corpus,
    including the (tfidf desc, term asc) tie rule."""
    import math
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    from mapchete_xarray_ray.pipelines.queries import REGISTRY

    got = REGISTRY["tfidf_topk"][0](sf_dir)
    tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
    ws = re.compile(r"\s+")
    tf, dfc = {}, Counter()
    for i in range(tbl.num_rows):
        t = tbl.column("text")[i].as_py().strip(" \t\n\f\r")
        if not t:
            continue
        toks = ws.split(t)
        c = Counter(toks)
        tf[tbl.column("doc_id")[i].as_py()] = c
        dfc.update(c.keys())
    n = float(len(tf))
    want = {}
    for d, c in tf.items():
        scored = sorted(((cnt * math.log(n / dfc[t]), t)
                         for t, cnt in c.items()),
                        key=lambda x: (-x[0], x[1]))[:3]
        for s, t in scored:
            want[(d, t)] = s
    found = {
        (d, t): s
        for d, t, s in zip(got.column("doc_id").to_pylist(),
                           got.column("term").to_pylist(),
                           got.column("tfidf").to_pylist())
    }
    assert set(found) == set(want)
    for k in want:
        assert found[k] == want[k], k  # bitwise: same libm ln path


def test_weighted_sample_aes_vs_bruteforce(sf_dir):
    """The partial-top-k + exact-final-pick A-ES sample equals the
    sequential top-50 by ln(u)/w, and is biased toward heavier docs."""
    import math

    import pyarrow.parquet as pq

    from mapchete_xarray_ray.pipelines.queries import REGISTRY

    got = REGISTRY["weighted_sample"][0](sf_dir)
    tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "n_chars"])
    keys = []
    for i in range(tbl.num_rows):
        d = tbl.column("doc_id")[i].as_py()
        w = tbl.column("n_chars")[i].as_py() + 1
        u = ((d * 2654435761) % 2147483647 + 1) / 2147483648.0
        keys.append((-(math.log(u) / w), d))
    want = {d for _, d in sorted(keys)[:50]}
    assert set(got.column("doc_id").to_pylist()) == want
    # long docs are overrepresented vs the corpus mean
    mean_all = np.mean(tbl.column("n_chars").to_numpy(zero_copy_only=False))
    mean_sel = np.mean(got.column("n_chars").to_numpy(zero_copy_only=False))
    assert mean_sel > mean_all


def test_pii_scrub_redacts_and_counts():
    """The fixture corpus carries no PII (the driver hash check passes
    on identity there) — this test supplies the signal: emails redact
    first, then digit runs, counts match, and digits INSIDE an email
    are consumed by the email token (order dependence pinned)."""
    from mapchete_xarray_ray.stages.text import pii_scrub_stage

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "write bob.smith+x@ex-a.mple.com or call 0123456789",
            "ids 123456 and 9876543210, mail a@b.co",
            "clean text, short 12345 stays",
            "",
            # 6+ digit run INSIDE the email local part: the email pass
            # must consume it whole (digits-first would leave
            # "user<NUM>@mail.com" -> "user<<EMAIL>" with n_numbers=1)
            "user123456@mail.com wrote",
        ]),
    })
    out = pii_scrub_stage(t)
    assert out.column("clean_text").to_pylist() == [
        "write <EMAIL> or call <NUM>",
        "ids <NUM> and <NUM>, mail <EMAIL>",
        "clean text, short 12345 stays",
        "",
        "<EMAIL> wrote",
    ]
    assert out.column("n_emails").to_pylist() == [1, 1, 0, 0, 1]
    assert out.column("n_numbers").to_pylist() == [1, 2, 0, 0, 0]


def test_doc_gram_pairs_short_docs_and_dedup():
    """Word-n-gram pair extraction: docs shorter than n yield no grams
    (never a negative-length slice), repeated grams within a doc dedup,
    empty/whitespace-only docs drop out, and gram strings are exact."""
    from mapchete_xarray_ray.pipelines.queries import _doc_gram_pairs

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "a b",              # 2 tokens < n=3 -> no grams
            "a b c",            # exactly one gram
            "a b c a b c a b",  # "a b c" twice -> dedups to once
            "   ",              # whitespace-only -> dropped
            "",                 # empty -> dropped
        ]),
    })
    docs, grams = _doc_gram_pairs(t, 3)
    pairs = sorted(zip(docs.to_pylist(), grams.to_pylist()))
    assert pairs == [
        (2, "a b c"),
        (3, "a b c"), (3, "b c a"), (3, "c a b"),
    ]
    # all-short batch -> both outputs empty with stable types
    docs2, grams2 = _doc_gram_pairs(
        pa.table({"doc_id": pa.array([9], pa.int64()),
                  "text": pa.array(["x y"])}), 3)
    assert len(docs2) == 0 and len(grams2) == 0
