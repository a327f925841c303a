"""Property-based tests (hypothesis): randomized volumes and streams.

Each example spins real Spark jobs, so example counts are kept small;
the properties themselves are the reference's core invariants applied
to arbitrary inputs rather than the fixture cube.
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _random_volume(spark, seed: int, dims: tuple[int, int, int]):
    rng = np.random.default_rng(seed)
    z, y, x = dims
    arr = rng.integers(0, 5, size=(z, y, x), dtype=np.int64)
    pdf = pd.DataFrame(
        {
            "z": np.repeat(np.arange(z), y * x),
            "y": np.tile(np.repeat(np.arange(y), x), z),
            "x": np.tile(np.arange(x), z * y),
            "label": arr.ravel(),
        }
    )
    return spark.createDataFrame(pdf, "z long, y long, x long, label long"), arr


@given(
    seed=st.integers(0, 10_000),
    dims=st.tuples(st.integers(1, 6), st.integers(1, 6), st.integers(1, 6)),
    scale=st.integers(1, 3),
)
@settings(**SETTINGS)
def test_upscale_properties_random(spark, seed, dims, scale):
    from atlas_upscaling_dask_spark.operators.upscale import upscale_coo
    from atlas_upscaling_dask_spark.operators.verify import (
        label_sets_equal,
        upscale_mismatches,
    )

    vox, arr = _random_volume(spark, seed, dims)
    up = upscale_coo(vox, scale)
    n = int(np.prod(dims))
    assert up.count() == scale**3 * n
    assert upscale_mismatches(vox, up, scale).isEmpty()
    assert label_sets_equal(vox, up)


@given(
    seed=st.integers(0, 10_000),
    dims=st.tuples(st.integers(2, 5), st.integers(2, 5), st.integers(2, 5)),
    wrap=st.booleans(),
)
@settings(**SETTINGS)
def test_outline_matches_numpy_roll(spark, seed, dims, wrap):
    # the reference's own kernel, re-derived in NumPy as ground truth
    # (upscale_streaming_enhance.py:107-119: d * ((d != roll(d,±1,ax)) | …))
    from atlas_upscaling_dask_spark.operators.outline import outline_window

    vox, arr = _random_volume(spark, seed, dims)
    if wrap:
        diff = np.zeros_like(arr, dtype=bool)
        for ax in range(3):
            diff |= arr != np.roll(arr, 1, axis=ax)
            diff |= arr != np.roll(arr, -1, axis=ax)
    else:
        diff = np.zeros_like(arr, dtype=bool)
        for ax in range(3):
            for d in (1, -1):
                shifted = np.roll(arr, d, axis=ax)
                # non-wrap: out-of-range neighbor counts as equal
                sl = [slice(None)] * 3
                sl[ax] = 0 if d == 1 else -1
                shifted[tuple(sl)] = arr[tuple(sl)]
                diff |= arr != shifted
    expect = np.where(diff, arr, 0)

    got = outline_window(vox, wrap=wrap).collect()
    for r in got:
        assert r["label"] == int(expect[r["z"], r["y"], r["x"]]), (
            f"wrap={wrap} at {(r['z'], r['y'], r['x'])}"
        )


@given(
    seed=st.integers(0, 10_000),
    n_left=st.integers(1, 20),
    n_right=st.integers(0, 20),
)
@settings(**SETTINGS)
def test_asof_matches_merge_asof_random(spark, seed, n_left, n_right):
    from atlas_upscaling_dask_spark.operators.asof import asof_join

    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 3, n_left),
            "t": rng.choice(np.arange(0, 1000), n_left, replace=False).astype(np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 3, max(n_right, 1))[:n_right],
            "rt": rng.choice(np.arange(0, 1000), max(n_right, 1), replace=False).astype(
                np.int64
            )[:n_right],
            "pay": np.arange(n_right, dtype=np.int64),
        }
    )
    # right unique per (k, rt) by construction (rt sampled w/o replacement)
    sdf_l = spark.createDataFrame(left, "k long, t long")
    sdf_r = (
        spark.createDataFrame(right, "k long, rt long, pay long")
        if n_right
        else spark.createDataFrame([], "k long, rt long, pay long")
    )
    got = (
        asof_join(sdf_l, sdf_r, "k", "k", "t", "rt", payload_cols=["pay"])
        .toPandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    expect = (
        pd.merge_asof(
            left.sort_values("t"),
            right.rename(columns={"rt": "t"}).sort_values("t"),
            on="t",
            by="k",
        )
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    g = got["pay"].where(got["pay"].notna(), -1).astype(int).tolist()
    e = [int(v) if pd.notna(v) else -1 for v in expect["pay"]]
    assert g == e


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(0, 1000), stride=st.sampled_from([2, 3]))
def test_downsample_mode_label_membership(spark, seed, stride):
    # every output label must be a member of its source block, and every
    # non-empty block must produce exactly one output row
    import numpy as np
    import pandas as pd

    from atlas_upscaling_dask_spark.operators.pyramid import downsample_mode

    rng = np.random.default_rng(seed)
    n = 6
    zz, yy, xx = np.meshgrid(range(n), range(n), range(n), indexing="ij")
    pdf = pd.DataFrame({
        "z": zz.ravel(), "y": yy.ravel(), "x": xx.ravel(),
        "label": rng.integers(0, 5, n**3),
    })
    df = spark.createDataFrame(pdf, "z long, y long, x long, label long")
    out = downsample_mode(df, stride).collect()

    blocks = {}
    for r in pdf.itertuples():
        blocks.setdefault((r.z // stride, r.y // stride, r.x // stride), []).append(r.label)
    assert len(out) == len(blocks)
    for r in out:
        members = blocks[(r["z"], r["y"], r["x"])]
        assert r["label"] in members
        # winner's count must be maximal
        from collections import Counter

        c = Counter(members)
        assert c[r["label"]] == max(c.values())


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(0, 1000))
def test_region_adjacency_matches_bruteforce(spark, seed):
    import numpy as np
    import pandas as pd

    from atlas_upscaling_dask_spark.operators.outline import region_adjacency

    rng = np.random.default_rng(seed)
    n = 5
    arr = rng.integers(0, 4, (n, n, n))
    zz, yy, xx = np.meshgrid(range(n), range(n), range(n), indexing="ij")
    pdf = pd.DataFrame({
        "z": zz.ravel(), "y": yy.ravel(), "x": xx.ravel(), "label": arr.ravel()
    })
    df = spark.createDataFrame(pdf, "z long, y long, x long, label long")
    got = {(r["label_a"], r["label_b"]) for r in region_adjacency(df).collect()}

    expect = set()
    for axis in range(3):
        a = np.moveaxis(arr, axis, 0)
        la, lb = a[:-1].ravel(), a[1:].ravel()
        for p, q in zip(la, lb):
            if p != q:
                expect.add((min(int(p), int(q)), max(int(p), int(q))))
    assert got == expect


@given(
    seed=st.integers(0, 10_000),
    dims=st.tuples(st.integers(1, 4), st.integers(1, 24), st.integers(1, 24)),
    dt=st.sampled_from(["u1", "u2", "u4", "i2", "i4"]),
    bo=st.sampled_from(["<", ">"]),
    rps=st.integers(1, 17),
    tiled=st.booleans(),
    big=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_tiff_write_parse_roundtrip_property(seed, dims, dt, bo, rps, tiled, big):
    # pure writer<->parser closure across shapes, dtypes, byte orders,
    # strip/tile layouts, and classic/BigTIFF headers — no Spark needed
    import os
    import tempfile

    from atlas_upscaling_dask_spark.sources import tiff

    rng = np.random.default_rng(seed)
    info_max = np.iinfo(np.dtype(dt))
    vol = rng.integers(
        info_max.min, int(info_max.max) + 1, size=dims, dtype=np.dtype(dt)
    )
    path = os.path.join(tempfile.mkdtemp(prefix="tiff_prop_"), "v.tif")
    tile = (min(rps, 16), min(rps + 3, 16)) if tiled else None
    tiff.write_tiff(
        path, vol, rows_per_strip=rps, byteorder=bo, tile=tile, bigtiff=big
    )
    info = tiff.parse_tiff(path)
    assert info.shape == dims
    assert info.dtype.kind == np.dtype(dt).kind
    assert info.dtype.itemsize == np.dtype(dt).itemsize
    nz, ny, nx = dims
    with open(path, "rb") as fh:
        for z in range(nz):
            got = tiff._read_page_rows(fh, info.pages[z], 0, ny, 0, nx)
            assert np.array_equal(got, vol[z]), (z, dims, dt, bo, rps, tiled, big)


@given(
    seed=st.integers(0, 10_000),
    threshold=st.sampled_from([0.3, 0.5, 0.7, 0.85]),
)
@settings(**SETTINGS)
def test_prefix_filter_join_matches_bruteforce(spark, seed, threshold):
    # The AllPairs prefix-filter theorem (Jaccard >= t pairs always share
    # a prefix token) checked empirically: the candidate-pruned join must
    # return EXACTLY the brute-force all-pairs result — same pairs, same
    # intersection/size counts.
    from atlas_upscaling_dask_spark.extensions.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_join,
    )

    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(12)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 15)))
        for _ in range(rng.integers(4, 10))
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    key = lambda r: (r["d1"], r["d2"], r["inter"], r["n1"], r["n2"])
    truth = {key(r) for r in ngram_jaccard_pairs(df, 3, threshold).collect()}
    got = {key(r) for r in prefix_filter_join(df, threshold, 3).collect()}
    assert got == truth, (seed, threshold, truth - got, got - truth)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@given(seed=st.integers(0, 10_000), d=st.sampled_from([1, 2]))
@settings(**SETTINGS)
def test_edit_distance_join_matches_bruteforce(spark, seed, d):
    # The pigeonhole segment theorem (<= d edits leave one of d+1
    # segments verbatim, shifted <= d) checked empirically: the
    # candidate-pruned join must equal brute-force all-pairs — incl.
    # insertions/deletions, duplicate strings, and the short bucket
    # (len <= d), over an adversarially small alphabet.
    from atlas_upscaling_dask_spark.extensions.dedup import edit_distance_join

    rng = np.random.default_rng(seed)
    strings = [
        "".join(rng.choice(list("ab"), size=rng.integers(0, 9)))
        for _ in range(rng.integers(4, 12))
    ]
    df = spark.createDataFrame(
        list(enumerate(strings)), "id long, s string"
    )
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_join(df, "id", "s", d).collect()
    }
    truth = {
        (i, j, _lev(strings[i], strings[j]))
        for i in range(len(strings))
        for j in range(i + 1, len(strings))
        if _lev(strings[i], strings[j]) <= d
    }
    assert got == truth, (seed, d, truth - got, got - truth)


@given(seed=st.integers(0, 10_000), window=st.sampled_from([2, 3, 5]))
@settings(**SETTINGS)
def test_sorted_neighborhood_matches_naive(spark, seed, window):
    # Distributed row numbers (range partitions + broadcast offsets)
    # and the bucket/successor pairing must reproduce the single-sort
    # definition exactly — including duplicate sort keys (tie-broken
    # by id) and pairs straddling range-partition boundaries.
    from atlas_upscaling_dask_spark.extensions.dedup import (
        sorted_neighborhood_pairs,
    )

    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 40))
    keys = [int(k) for k in rng.integers(0, 10, n)]
    df = spark.createDataFrame(
        [(i, keys[i]) for i in range(n)], "id long, k long"
    )
    got = {
        (r["id_a"], r["id_b"], r["rn_a"], r["rn_b"])
        for r in sorted_neighborhood_pairs(
            df, "id", ["k"], window=window, n_ranges=4
        ).collect()
    }
    order = sorted(range(n), key=lambda i: (keys[i], i))
    truth = {
        (order[p], order[q], p + 1, q + 1)
        for p in range(n)
        for q in range(p + 1, min(p + window, n))
    }
    assert got == truth, (seed, window, truth - got, got - truth)


@given(seed=st.integers(0, 10_000))
@settings(**SETTINGS)
def test_kmv_merge_equals_direct_sketch(spark, seed):
    # The mergeability theorem the rolling-window row leans on:
    # k-smallest-of-union of per-group bottom-k sketches == bottom-k of
    # the union sketched directly, for arbitrary overlapping groups.
    from atlas_upscaling_dask_spark.extensions.sketches import (
        kmv_merge,
        kmv_sketch,
    )

    rng = np.random.default_rng(seed)
    n_groups = int(rng.integers(2, 5))
    rows = [
        (g, int(v))
        for g in range(n_groups)
        for v in rng.integers(0, 300, int(rng.integers(5, 120)))
    ]
    df = spark.createDataFrame(rows, "g int, v long")
    k = int(rng.choice([8, 16, 64]))
    merged = kmv_merge(kmv_sketch(df, "v", ["g"], k), [], k)
    direct = kmv_sketch(df, "v", [], k)
    (m,) = merged.collect()
    (d,) = direct.collect()
    assert m["sketch"] == d["sketch"], (seed, k)


@given(
    seed=st.integers(0, 10_000),
    threshold=st.sampled_from([0.5, 0.7, 0.9]),
)
@settings(**SETTINGS)
def test_containment_join_matches_bruteforce(spark, seed, threshold):
    # Containment prefix-filter completeness: any (in, out) pair with
    # |S_in ∩ S_out| >= ceil(t·|S_in|) must share at least one of the
    # contained doc's |S_in| - ceil(t·|S_in|) + 1 rarest shingles with
    # the containing doc — the pruned join equals brute force exactly.
    from atlas_upscaling_dask_spark.extensions.dedup import (
        containment_join,
        word_shingles,
    )

    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(12)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 15)))
        for _ in range(rng.integers(4, 10))
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    sets = {}
    for r in word_shingles(df, 3).collect():
        sets.setdefault(r["doc_id"], set()).add(r["gram"])
    truth = set()
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a != b and len(sa & sb) / len(sa) >= threshold:
                truth.add((a, b, len(sa & sb), len(sa), len(sb)))
    key = lambda r: (r["d_in"], r["d_out"], r["inter"], r["n_in"], r["n_out"])
    got = {key(r) for r in containment_join(df, threshold, 3).collect()}
    assert got == truth, (seed, threshold, truth - got, got - truth)


def test_containment_sees_what_jaccard_cannot(spark):
    # A short snippet verbatim inside a long page: containment = 1.0
    # while Jaccard is far below any useful near-dup threshold — the
    # directional screen is not expressible as a symmetric join.
    from atlas_upscaling_dask_spark.extensions.dedup import (
        containment_join,
        ngram_jaccard_pairs,
    )

    snippet = "alpha beta gamma delta epsilon"
    page = " ".join(f"tok{i}" for i in range(200)) + " " + snippet
    df = spark.createDataFrame(
        [(1, snippet), (2, page)], "doc_id long, text string"
    )
    got = containment_join(df, threshold=0.9, n=3).collect()
    assert [(r["d_in"], r["d_out"]) for r in got] == [(1, 2)]
    assert got[0]["containment"] == 1.0
    assert ngram_jaccard_pairs(df, 3, 0.5).count() == 0


@given(seed=st.integers(0, 10_000), k=st.sampled_from([1, 3, 8]))
@settings(**SETTINGS)
def test_equidepth_histogram_matches_sorted_slices(spark, seed, k):
    # Bucket b = floor(rank0*k/N) of the sorted multiset must hold
    # exactly ceil((b+1)N/k) - ceil(bN/k) values, with lo/hi the slice
    # endpoints — checked against a plain sorted list, duplicates and
    # skew included.
    from atlas_upscaling_dask_spark.operators.profile import equidepth_histogram

    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 60))
    vals = sorted(float(v) for v in rng.integers(0, 10, size=n))
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {
        r["bucket"]: (r["n_rows"], r["lo"], r["hi"])
        for r in equidepth_histogram(df, "v", k=k, n_ranges=4).collect()
    }
    want = {}
    for b in range(k):
        lo_i = (b * n + k - 1) // k
        hi_i = ((b + 1) * n + k - 1) // k
        if hi_i > lo_i:
            want[b] = (hi_i - lo_i, vals[lo_i], vals[hi_i - 1])
    assert got == want, (seed, k, got, want)


@given(seed=st.integers(0, 10_000))
@settings(**SETTINGS)
def test_merge_intervals_matches_bruteforce(spark, seed):
    # Random interval sets per key vs a plain sweep-line merge.
    from atlas_upscaling_dask_spark.operators.resample import merge_intervals

    rng = np.random.default_rng(seed)
    rows = []
    for key in range(int(rng.integers(1, 4))):
        for _ in range(int(rng.integers(1, 12))):
            s = int(rng.integers(0, 50))
            rows.append((key, s, s + int(rng.integers(1, 15))))
    df = spark.createDataFrame(rows, "key long, start long, end long")
    want = []
    bykey = {}
    for key, s, e in rows:
        bykey.setdefault(key, []).append((s, e))
    for key, ivs in bykey.items():
        ivs.sort()
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e), merged[-1][2] + 1)
            else:
                merged.append((s, e, 1))
        for i, (s, e, c) in enumerate(merged, 1):
            want.append((key, i, s, e, c))
    got = sorted(map(tuple, merge_intervals(df).collect()))
    assert got == sorted(want), (seed, got, want)


# ---------------------------------------------------------------------------
# round-9 codecs: GIF LZW + container, URL canonicalizer — pure local
# properties (no Spark per example, so examples can be plentiful)


@given(
    seed=st.integers(0, 10_000),
    alphabet=st.integers(2, 256),
    n=st.integers(1, 5000),
)
@settings(max_examples=40, deadline=None)
def test_gif_lzw_roundtrip_any_alphabet(seed, alphabet, n):
    from atlas_upscaling_dask_spark.sources.gif import lzw_decode, lzw_encode

    mcs = max(2, (alphabet - 1).bit_length())
    rng = np.random.default_rng(seed)
    data = rng.integers(0, alphabet, n).astype(np.uint8).tobytes()
    assert lzw_decode(lzw_encode(data, mcs), mcs, n).tobytes() == data


@given(
    seed=st.integers(0, 10_000),
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    ncolors=st.integers(1, 256),
    interlace=st.booleans(),
)
@settings(max_examples=25, deadline=None)
def test_gif_image_roundtrip_any_geometry(seed, h, w, ncolors, interlace):
    from atlas_upscaling_dask_spark.sources.gif import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncolors, 3)).astype(np.uint8)
    idx = rng.integers(0, ncolors, (h, w)).astype(np.uint8)
    g = encode_gif([idx], palette=pal)
    out = decode_gif(g if not interlace else encode_gif([idx], palette=pal,
                                                        interlace=True))
    assert np.array_equal(out, pal[idx])


@given(
    seed=st.integers(0, 10_000),
    nf=st.integers(1, 5),
)
@settings(max_examples=15, deadline=None)
def test_gif_animation_composite_matches_numpy_model(seed, nf):
    from atlas_upscaling_dask_spark.sources.gif import (
        encode_gif,
        iter_composited,
    )

    rng = np.random.default_rng(seed)
    H, W = 12, 15
    pal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
    frames, offsets, disposals, trans = [], [], [], []
    for _ in range(nf):
        fh, fw = int(rng.integers(1, H + 1)), int(rng.integers(1, W + 1))
        top = int(rng.integers(0, H - fh + 1))
        left = int(rng.integers(0, W - fw + 1))
        frames.append(rng.integers(0, 8, (fh, fw)).astype(np.uint8))
        offsets.append((top, left))
        disposals.append(int(rng.integers(0, 4)))
        trans.append(int(rng.integers(0, 8)) if rng.random() < 0.5 else None)
    g = encode_gif(frames, palette=pal, screen_size=(H, W), offsets=offsets,
                   disposals=disposals, transparent_indices=trans,
                   background_index=0)
    # independent numpy model of the disposal/transparency algebra
    bg = pal[0]
    canvas = np.empty((H, W, 3), np.uint8)
    canvas[:] = bg
    want = []
    for f, (t, l), disp, tr in zip(frames, offsets, disposals, trans):
        fh, fw = f.shape
        saved = canvas[t:t + fh, l:l + fw].copy()
        rgb = pal[f]
        region = canvas[t:t + fh, l:l + fw]
        if tr is None:
            region[:] = rgb
        else:
            m = f != tr
            region[m] = rgb[m]
        want.append(canvas.copy())
        if disp == 2:
            canvas[t:t + fh, l:l + fw] = bg
        elif disp == 3:
            canvas[t:t + fh, l:l + fw] = saved
    got = [c for _, c in iter_composited(g)]
    assert len(got) == nf
    for a, b in zip(got, want):
        assert np.array_equal(a, b)


_URL_SCHEMES = st.sampled_from(["http", "HTTP", "https", "HtTpS"])
_URL_HOSTS = st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,6}(\.[A-Za-z]{2,4}){1,2}",
                           fullmatch=True)
_URL_SEGS = st.lists(
    st.sampled_from(["a", "b2", "c-c", ".", "..", "", "x%20y"]),
    min_size=0, max_size=5,
)
_URL_PARAMS = st.lists(
    st.sampled_from(["a=1", "b=2", "utm_source=x", "fbclid=9", "z=", "k=vv"]),
    min_size=0, max_size=5,
)


@given(
    scheme=_URL_SCHEMES,
    host=_URL_HOSTS,
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    segs=_URL_SEGS,
    params=_URL_PARAMS,
    frag=st.sampled_from(["", "#f", "#a/b?c"]),
)
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_url_canonicalize_idempotent_and_stable(
    spark, scheme, host, port, segs, params, frag
):
    from atlas_upscaling_dask_spark.extensions.urls import canonicalize_urls

    raw = f"{scheme}://{host}{port}/" + "/".join(segs)
    if params:
        raw += "?" + "&".join(params)
    raw += frag
    df = spark.createDataFrame([(0, raw)], "doc_id long, url string")
    once = canonicalize_urls(df).collect()[0]["canonical_url"]
    df2 = spark.createDataFrame([(0, once)], "doc_id long, url string")
    twice = canonicalize_urls(df2).collect()[0]["canonical_url"]
    assert twice == once, raw
    # canonical form never carries fragments, tracking params, '..', '//'
    assert "#" not in once and "utm_" not in once and "fbclid" not in once
    assert "/../" not in once and "//" not in once.split("://", 1)[1]
