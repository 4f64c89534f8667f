"""Property-based tests (hypothesis) for the pure kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mapchete_xarray_ray.grid import (
    Bounds,
    TilePyramid,
    cell_decode,
    cell_encode,
    cell_parent,
    output_shape,
    pack_tile_id,
    unpack_tile_id,
    zarr_chunk_from_xy,
)
from mapchete_xarray_ray.functions.extract import extract_text
from mapchete_xarray_ray.oracle import point_in_ring

GEO = TilePyramid("geodetic")


@given(zoom=st.integers(0, 15),
       lon=st.floats(-180, 179.999, allow_nan=False),
       lat=st.floats(-89.999, 90, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_point_to_tile_in_range_and_contains(zoom, lon, lat):
    row, col = GEO.point_to_tile(np.array([lon]), np.array([lat]), zoom)
    assert 0 <= row[0] < GEO.matrix_height(zoom)
    assert 0 <= col[0] < GEO.matrix_width(zoom)
    tb = GEO.tile_bounds(zoom, int(row[0]), int(col[0]))
    # the point lies inside its tile up to float64 boundary quantization
    # (a point within ~1 ULP of a tile edge rounds across it — the
    # reference's own float division has the same property)
    tol = 1e-9
    assert tb.left - tol <= lon <= tb.right + tol
    assert tb.bottom - tol <= lat <= tb.top + tol


@given(zoom=st.integers(1, 10))
@settings(max_examples=30, deadline=None)
def test_snap_bounds_idempotent_and_covering(zoom):
    raw = (-171.3, 12.7, -100.1, 55.9)
    snapped = GEO.snap_bounds(raw, zoom)
    assert snapped.left <= raw[0] and snapped.right >= raw[2]
    assert snapped.bottom <= raw[1] and snapped.top >= raw[3]
    again = GEO.snap_bounds(tuple(snapped), zoom)
    assert tuple(again) == tuple(snapped)


@given(zoom=st.integers(0, 26),
       data=st.data())
@settings(max_examples=200, deadline=None)
def test_morton_roundtrip_and_parent(zoom, data):
    row = data.draw(st.integers(0, 2**zoom - 1))
    col = data.draw(st.integers(0, 2**(zoom + 1) - 1))
    c = cell_encode(np.array([row]), np.array([col]), zoom)
    r2, c2, z2 = cell_decode(c)
    assert (r2[0], c2[0], z2[0]) == (row, col, zoom)
    if zoom > 0:
        pr, pc_, pz = cell_decode(cell_parent(c))
        assert (pr[0], pc_[0], pz[0]) == (row >> 1, col >> 1, zoom - 1)


@given(zoom=st.integers(0, 28), data=st.data())
@settings(max_examples=200, deadline=None)
def test_tile_id_pack_roundtrip(zoom, data):
    row = data.draw(st.integers(0, 2**min(zoom, 28) - 1 if zoom else 0))
    col = data.draw(st.integers(0, 2**min(zoom + 1, 29) - 1))
    z, r, c = unpack_tile_id(pack_tile_id(zoom, row, col))
    assert (int(z), int(r), int(c)) == (zoom, row, col)


@given(st.integers(0, 7), st.integers(0, 7))
@settings(max_examples=64, deadline=None)
def test_chunk_assignment_matches_tile_for_interior_points(trow, tcol):
    """Reference-exact chunk math == canonical tile math for interior
    points of every tile of the snapped 3-D fixture region."""
    b = Bounds(-180, 45, -135, 90)
    shp = output_shape(b, GEO, 5)
    tb = GEO.tile_bounds(5, trow, tcol)
    x = (float(tb.left) + float(tb.right)) / 2 + 0.31
    y = (float(tb.top) + float(tb.bottom)) / 2 - 0.17
    crow, ccol = zarr_chunk_from_xy(np.array([x]), np.array([y]), b, shp, 256, 1)
    prow, pcol = GEO.point_to_tile(np.array([x]), np.array([y]), 5)
    assert (crow[0], ccol[0]) == (prow[0], pcol[0])


@given(st.text(max_size=300))
@settings(max_examples=150, deadline=None)
def test_extract_deterministic_and_clean(text):
    html = f"<html><body><p>{text}</p></body></html>"
    out1 = extract_text(html.encode("utf-8", errors="ignore"))
    out2 = extract_text(html.encode("utf-8", errors="ignore"))
    assert out1 == out2
    assert "<p>" not in out1


@given(st.floats(-10, 10), st.floats(-10, 10))
@settings(max_examples=200, deadline=None)
def test_pip_square(x, y):
    ring = [(-5.0, -5.0), (5.0, -5.0), (5.0, 5.0), (-5.0, 5.0), (-5.0, -5.0)]
    inside = point_in_ring(x, y, ring)
    want = (-5 <= x <= 5) and (-5 <= y <= 5)
    assert inside == want


# --- round-2 vectorized kernels vs scalar references ---------------------


@given(st.data())
@settings(max_examples=100, deadline=None)
def test_rowwise_topk_matches_scalar(data):
    from mapchete_xarray_ray.stages.ann import rowwise_topk

    q = data.draw(st.integers(1, 8))
    c = data.draw(st.integers(1, 12))
    k = data.draw(st.integers(1, 6))
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    # small float pool so ties actually happen
    key = rng.choice([0.0, 0.5, 1.0, -0.5], size=(q, c))
    q_ids = rng.integers(0, 6, size=q)
    c_ids = rng.integers(0, 6, size=c)
    q_sel, c_sel, rank = rowwise_topk(key, q_ids, c_ids, k)
    # scalar reference: per row lexsort((cand_id, key)) excluding same id
    exp_rows = []
    for qi in range(q):
        mask = c_ids != q_ids[qi]
        km, cm, idx = key[qi][mask], c_ids[mask], np.arange(c)[mask]
        order = np.lexsort((cm, km))[:min(k, mask.sum())]
        for r, oi in enumerate(order, 1):
            exp_rows.append((qi, idx[oi], r))
    got_rows = list(zip(q_sel.tolist(), c_sel.tolist(), rank.tolist()))
    # compare as (row, rank) -> candidate VALUE-key (ties may pick any
    # index among equal (key, cand_id) pairs; the sort key must match)
    exp = sorted((qi, r, key[qi][ci], c_ids[ci]) for qi, ci, r in exp_rows)
    got = sorted((qi, r, key[qi][ci], c_ids[ci]) for qi, ci, r in got_rows)
    assert got == exp


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_keyed_running_state_matches_sequential(data):
    from mapchete_xarray_ray.stages.streaming import KeyedRunningState

    n = data.draw(st.integers(0, 200))
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    keys = rng.integers(0, 8, size=n)
    # ts ascending per key <=> globally sorted then stable-keyed order
    ts = np.sort(rng.integers(0, 10_000, size=n))
    vals = rng.integers(-50, 50, size=n)
    chunk = data.draw(st.integers(1, 50))

    st_v = KeyedRunningState()
    for lo in range(0, n, chunk):
        st_v.update(keys[lo:lo + chunk], ts[lo:lo + chunk], vals[lo:lo + chunk])
    got = st_v.snapshot().to_pydict()

    # sequential reference
    state = {}
    for k, t, v in zip(keys, ts, vals):
        s = state.get(k)
        if s is None:
            state[k] = [1, v, t, 0]
        else:
            gap = t - s[2]
            s[0] += 1
            s[1] += v
            s[2] = t
            if gap > s[3]:
                s[3] = gap
    want_keys = sorted(state)
    assert got["user_id"] == [int(k) for k in want_keys]
    assert got["n_events"] == [state[k][0] for k in want_keys]
    assert got["sum_value_milli"] == [int(state[k][1]) for k in want_keys]
    assert got["last_ts_us"] == [int(state[k][2]) for k in want_keys]
    assert got["max_gap_us"] == [int(state[k][3]) for k in want_keys]


@given(st.data())
@settings(max_examples=40, deadline=None)
def test_cron_expansion_matches_minute_scan(data):
    from datetime import datetime, timedelta

    from mapchete_xarray_ray.spec import _expand_pattern

    minute = data.draw(st.sampled_from(["0", "30", "*/20", "5,35"]))
    hour = data.draw(st.sampled_from(["0", "*", "6-8", "*/12"]))
    dom = data.draw(st.sampled_from(["*", "1", "10-12", "*/9"]))
    month = data.draw(st.sampled_from(["*", "2", "1-3"]))
    dow = data.draw(st.sampled_from(["*", "1", "0,6"]))
    pattern = " ".join([minute, hour, dom, month, dow])
    start = datetime(2022, 1, data.draw(st.integers(1, 28)),
                     data.draw(st.integers(0, 23)))
    end = start + timedelta(days=data.draw(st.integers(0, 70)))

    got = _expand_pattern(start, end, pattern)

    def field_match(v, f, lo, hi):
        for item in f.split(","):
            step = 1
            if "/" in item:
                item, s = item.split("/")
                step = int(s)
            if item == "*":
                a, b = lo, hi
            elif "-" in item:
                a, b = map(int, item.split("-"))
            else:
                a = b = int(item)
            if v in range(a, b + 1, step):
                return True
        return False

    want = []
    t = start.replace(second=0, microsecond=0)
    while t <= end:
        m_ok = field_match(t.minute, minute, 0, 59)
        h_ok = field_match(t.hour, hour, 0, 23)
        mo_ok = field_match(t.month, month, 1, 12)
        dom_ok = field_match(t.day, dom, 1, 31)
        dow_ok = field_match((t.weekday() + 1) % 7, dow, 0, 7)
        if dom == "*" and dow == "*":
            day_ok = True
        elif dom != "*" and dow != "*":
            day_ok = dom_ok or dow_ok
        else:
            day_ok = dom_ok if dom != "*" else dow_ok
        if m_ok and h_ok and mo_ok and day_ok and t >= start:
            want.append(t)
        t += timedelta(minutes=1)
    assert got == want


@given(data=st.data())
@settings(max_examples=100, deadline=None)
def test_group_reduce_matches_python_fold(data):
    from mapchete_xarray_ray.nputil import group_reduce

    n = data.draw(st.integers(0, 60))
    keys = np.array(data.draw(st.lists(
        st.integers(-5, 5), min_size=n, max_size=n)), dtype=np.int64)
    vals = np.array(data.draw(st.lists(
        st.integers(-1000, 1000), min_size=n, max_size=n)), dtype=np.int64)
    uk, mx, tot = group_reduce(keys, (np.maximum, vals), (np.add, vals))
    want = {}
    for k, v in zip(keys.tolist(), vals.tolist()):
        m, s = want.get(k, (None, 0))
        want[k] = (v if m is None else max(m, v), s + v)
    assert uk.tolist() == sorted(want)
    assert mx.tolist() == [want[k][0] for k in sorted(want)]
    assert tot.tolist() == [want[k][1] for k in sorted(want)]


@given(data=st.data())
@settings(max_examples=60, deadline=None)
def test_doc_gram_pairs_matches_python_oracle(data):
    import pyarrow as pa

    from mapchete_xarray_ray.pipelines.queries import _doc_gram_pairs

    WORDS = ["a", "bb", "ccc", "dd"]
    n_docs = data.draw(st.integers(0, 8))
    texts, ids = [], []
    for i in range(n_docs):
        toks = data.draw(st.lists(st.sampled_from(WORDS), max_size=7))
        pad = data.draw(st.sampled_from(["", " ", "\t", "  "]))
        texts.append(pad + " ".join(toks) + pad)
        ids.append(i)
    n = data.draw(st.integers(1, 4))
    batch = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts, pa.string())})
    for distinct in (True, False):
        d, g = _doc_gram_pairs(batch, n, distinct=distinct)
        got = list(zip(d.to_pylist(), g.to_pylist()))
        want = []
        for i, t in zip(ids, texts):
            toks = t.strip(" \t\n\x0b\f\r").split()
            if not toks or toks == [""]:
                continue
            grams = [" ".join(toks[j:j + n])
                     for j in range(len(toks) - n + 1)]
            want += [(i, x) for x in
                     (dict.fromkeys(grams) if distinct else grams)]
        assert sorted(got) == sorted(want), (n, distinct)
