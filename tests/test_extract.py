"""Extraction kernel tests — byte-identity + exact semantics."""

from mapchete_xarray_ray.fixtures import make_pages
from mapchete_xarray_ray.functions.extract import extract_text
from mapchete_xarray_ray.collect import arrow_block_refs


def test_basic_extraction():
    html = b"<html><head><title>T</title></head><body><p>hello world</p></body></html>"
    assert extract_text(html) == "T\nhello world"


def test_script_style_comment_dropped():
    html = (b"<body><script>var x = '<p>not text</p>';</script>"
            b"<style>p{color:red}</style><!-- secret -->visible</body>")
    assert extract_text(html) == "visible"


def test_entities():
    assert extract_text(b"a &amp; b &lt;c&gt; &#65; &#x42; &quot;q&quot;") == 'a & b <c> A B "q"'


def test_block_tags_newlines():
    html = b"<p>one</p><p>two</p><div>three</div>"
    assert extract_text(html) == "one\ntwo\nthree"


def test_whitespace_collapse():
    html = b"<p>a    b\t c</p>\n\n\n\n<p>d</p>"
    assert extract_text(html) == "a b c\n\nd"


def test_str_and_bytes_agree():
    h = "<p>unicode äöü &#8364;</p>"
    assert extract_text(h) == extract_text(h.encode("utf-8"))


def test_fixture_ground_truth_is_kernel_output():
    t = make_pages(n=50)
    htmls = t.column("html").to_pylist()
    texts = t.column("text").to_pylist()
    for h, txt in zip(htmls, texts):
        assert extract_text(h) == txt
        assert txt  # non-empty
        assert "script" not in txt and "color" not in txt


def test_determinism_repeated():
    t1 = make_pages(n=30, seed=42)
    t2 = make_pages(n=30, seed=42)
    assert t1.equals(t2)


def test_distributed_extraction_byte_identical_per_url():
    """North-rule gate: the DISTRIBUTED extract stage (arbitrary
    batching/partitioning) produces byte-identical text per url vs the
    sequential oracle."""
    import pyarrow as pa
    import ray

    from mapchete_xarray_ray.oracle import oracle_extracted
    from mapchete_xarray_ray.stages.text import extract_stage

    pages = make_pages(n=400, dup_frac=0.1)
    want = oracle_extracted(pages)
    # shuffle row order + odd partitioning to prove order-independence
    ds = (ray.data.from_arrow(pages)
          .random_shuffle(seed=7)
          .repartition(13)
          .map_batches(extract_stage, batch_format="pyarrow"))
    tabs = [t for t in (ray.get(r) for r in arrow_block_refs(ds))
            if t.num_columns > 0]
    got = pa.concat_tables(tabs)
    for url, text in zip(got.column("url").to_pylist(),
                         got.column("text").to_pylist()):
        assert text == want[url], f"text mismatch for {url}"
    assert set(got.column("url").to_pylist()) == set(want)
