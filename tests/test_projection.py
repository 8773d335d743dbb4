import numpy as np

import jax.numpy as jnp

from delora_tpu.ops.projection import (
    ProjectionSpec,
    gather_image_attribute,
    project_batch,
    project_scan,
)

SPEC = ProjectionSpec(
    height=8,
    width=16,
    fov_down=np.deg2rad(-24.5),
    fov_up=np.deg2rad(2.0),
    fov_left=np.deg2rad(-179.9),
    fov_right=np.deg2rad(179.9),
)


def reference_projection(points, valid, spec):
    """Numpy transliteration of the reference semantics (projection.py:48-106):
    sort ascending by range, first-writer-wins per rounded (v, u) pixel."""
    pts = points[valid]
    r = np.linalg.norm(pts[:, :3], axis=-1)
    order = np.argsort(r, kind="stable")
    pts, r = pts[order], r[order]
    u = (np.arctan2(pts[:, 1], pts[:, 0]) - spec.fov_left) / (
        spec.fov_right - spec.fov_left
    ) * (spec.width - 1)
    v = (
        np.arctan2(pts[:, 2], np.linalg.norm(pts[:, :2], axis=-1)) - spec.fov_down
    ) / (spec.fov_up - spec.fov_down) * (spec.height - 1)
    ur, vr = np.round(u), np.round(v)
    ok = (ur >= 0) & (ur <= spec.width - 1) & (vr >= 0) & (vr <= spec.height - 1) & (r > 0)
    img = np.zeros((spec.height, spec.width, 4))
    occupied = np.zeros((spec.height, spec.width), dtype=bool)
    for i in np.nonzero(ok)[0]:
        vv, uu = int(vr[i]), int(ur[i])
        if not occupied[vv, uu]:
            occupied[vv, uu] = True
            img[vv, uu, :3] = pts[i, :3]
            img[vv, uu, 3] = r[i]
    return img


def make_cloud(n=500, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)) * np.array([10.0, 10.0, 1.0])
    pts[:, 2] -= 1.0  # mostly below sensor, inside the (-24.5, 2) deg FoV band
    valid = rng.random(n) > 0.1
    return pts.astype(np.float32), valid


def test_matches_reference_semantics():
    pts, valid = make_cloud()
    res = project_scan(jnp.asarray(pts), jnp.asarray(valid), SPEC)
    ref_img = reference_projection(pts, valid, SPEC)
    # Ranges may tie (almost never with random floats): images must agree.
    np.testing.assert_allclose(np.asarray(res.image), ref_img, atol=1e-5)


def test_survivors_are_unique_per_pixel_and_closest():
    pts, valid = make_cloud(seed=1)
    res = project_scan(jnp.asarray(pts), jnp.asarray(valid), SPEC)
    survivor = np.asarray(res.survivor)
    img = np.asarray(res.image)
    pidx = np.asarray(res.point_index)

    # Each occupied pixel indexes exactly one surviving point holding its xyz.
    occupied = pidx >= 0
    assert occupied.sum() == survivor.sum()
    for vv, uu in zip(*np.nonzero(occupied)):
        i = pidx[vv, uu]
        assert survivor[i]
        np.testing.assert_allclose(img[vv, uu, :3], pts[i], atol=1e-6)
        np.testing.assert_allclose(img[vv, uu, 3], np.linalg.norm(pts[i]), rtol=1e-5)


def test_closest_point_wins():
    # Two points on the same ray -> same pixel; the nearer must win.
    pts = np.array([[5.0, 0.0, -1.0], [10.0, 0.0, -2.0]], dtype=np.float32)
    valid = np.ones(2, dtype=bool)
    res = project_scan(jnp.asarray(pts), jnp.asarray(valid), SPEC)
    survivor = np.asarray(res.survivor)
    assert survivor[0] and not survivor[1]


def test_invalid_and_out_of_fov_dropped():
    pts = np.array(
        [
            [0.0, 0.0, 0.0],      # zero point (invalid: r == 0)
            [1.0, 0.0, 5.0],      # elevation way above +2 deg FoV
            [5.0, 0.0, -1.0],     # fine
        ],
        dtype=np.float32,
    )
    valid = np.array([True, True, False])
    res = project_scan(jnp.asarray(pts), jnp.asarray(valid), SPEC)
    assert not bool(np.asarray(res.in_fov)[0])
    assert not bool(np.asarray(res.in_fov)[1])
    assert not bool(np.asarray(res.survivor)[2])  # masked out by `valid`
    assert np.asarray(res.survivor).sum() == 0


def test_batch_matches_single():
    pts0, valid0 = make_cloud(seed=2)
    pts1, valid1 = make_cloud(seed=3)
    batched = project_batch(
        jnp.stack([jnp.asarray(pts0), jnp.asarray(pts1)]),
        jnp.stack([jnp.asarray(valid0), jnp.asarray(valid1)]),
        SPEC,
    )
    single0 = project_scan(jnp.asarray(pts0), jnp.asarray(valid0), SPEC)
    np.testing.assert_allclose(
        np.asarray(batched.image[0]), np.asarray(single0.image), atol=1e-6
    )


def test_gather_image_attribute():
    pts, valid = make_cloud(seed=4)
    attr = np.random.default_rng(5).normal(size=(len(pts), 3)).astype(np.float32)
    res = project_scan(jnp.asarray(pts), jnp.asarray(valid), SPEC)
    img_attr = np.asarray(gather_image_attribute(jnp.asarray(attr), res.point_index))
    pidx = np.asarray(res.point_index)
    for vv, uu in zip(*np.nonzero(pidx >= 0)):
        np.testing.assert_allclose(img_attr[vv, uu], attr[pidx[vv, uu]], atol=1e-6)
    assert np.all(img_attr[pidx < 0] == 0.0)


def test_project_scan_compact_matches_project_scan():
    from delora_tpu.ops.projection import project_scan_compact

    pts, valid = make_cloud(seed=7)
    full = project_scan(jnp.asarray(pts), jnp.asarray(valid), SPEC)
    comp = project_scan_compact(jnp.asarray(pts), jnp.asarray(valid), SPEC)

    np.testing.assert_allclose(np.asarray(comp.image), np.asarray(full.image))
    np.testing.assert_array_equal(
        np.asarray(comp.point_index), np.asarray(full.point_index))
    # Compacted ids == the survivor set, each exactly once, mask aligned.
    survivors = set(np.nonzero(np.asarray(full.survivor))[0].tolist())
    ids = np.asarray(comp.ids)
    mask = np.asarray(comp.mask)
    assert mask.sum() == len(survivors)
    assert set(ids[mask].tolist()) == survivors
    assert not mask[mask.argmin():].any()  # mask is front-compacted


def test_project_image_packed_matches_project_scan():
    """The packed-key image-only projection picks the same winners except
    where two in-pixel candidates' ranges agree to the 16-bit truncation
    (~0.4%) — there the kept point is still near-closest."""
    from delora_tpu.ops.projection import project_image_packed

    rng = np.random.default_rng(5)
    N = 4096
    pts = rng.normal(size=(N, 3)).astype(np.float32) * np.array(
        [8.0, 8.0, 0.5], np.float32
    )
    pts[:, 2] -= 1.5
    valid = rng.random(N) > 0.1

    ref = project_scan(jnp.asarray(pts), jnp.asarray(valid), SPEC)
    # N > H*W here, so give the placement windows full headroom (the train
    # step's inputs are survivor-compacted to N <= H*W, where the default
    # smax has ~3x headroom).
    fast = project_image_packed(
        jnp.asarray(pts), jnp.asarray(valid), SPEC, smax=N
    )

    ref_img = np.asarray(ref.image)
    fast_img = np.asarray(fast)
    assert ref_img.shape == fast_img.shape
    # Occupancy is identical (only winner choice can differ).
    np.testing.assert_array_equal(ref_img[..., 3] > 0, fast_img[..., 3] > 0)
    diff = np.any(ref_img != fast_img, axis=-1)
    if diff.any():
        r_ref = ref_img[..., 3][diff]
        r_fast = fast_img[..., 3][diff]
        np.testing.assert_allclose(r_fast, r_ref, rtol=5e-3)


def test_project_image_packed_window_overflow_degrades_gracefully():
    """When more than ``smax`` sorted entries land in one pixel-tile, the
    overflowing tail's pixels come out EMPTY (excluded from any loss), never
    garbage. Forced here by funneling many points into few pixels."""
    from delora_tpu.ops.projection import project_image_packed

    rng = np.random.default_rng(9)
    N = 512
    # All points on one bearing: they collapse into a handful of pixels.
    base = np.array([5.0, 0.0, -1.0], np.float32)
    pts = base[None, :] * (1.0 + rng.random((N, 1), dtype=np.float32))
    valid = np.ones(N, bool)

    img_full = project_image_packed(
        jnp.asarray(pts), jnp.asarray(valid), SPEC, smax=N
    )
    img_tight = project_image_packed(
        jnp.asarray(pts), jnp.asarray(valid), SPEC, smax=64, tile=SPEC.width
    )
    full = np.asarray(img_full)
    tight = np.asarray(img_tight)
    occ_full = full[..., 3] > 0
    occ_tight = tight[..., 3] > 0
    # Tight windows can only LOSE pixels, and kept pixels match exactly.
    assert (occ_tight & ~occ_full).sum() == 0
    np.testing.assert_array_equal(tight[occ_tight], full[occ_tight])


def test_project_image_dispatch_both_branches():
    """project_image == project_scan(...).image on both the packed route
    (small pixel key) and the project_scan fallback (H*W >= 2**16)."""
    from delora_tpu.ops.projection import project_image

    pts, valid = make_cloud(seed=11)
    small = np.asarray(
        project_image(jnp.asarray(pts), jnp.asarray(valid), SPEC))
    ref = np.asarray(
        project_scan(jnp.asarray(pts), jnp.asarray(valid), SPEC).image)
    np.testing.assert_allclose(small, ref, atol=1e-6)

    big_spec = SPEC._replace(width=1 << 13, height=8)   # H*W = 2**16
    big = np.asarray(
        project_image(jnp.asarray(pts), jnp.asarray(valid), big_spec))
    big_ref = np.asarray(
        project_scan(jnp.asarray(pts), jnp.asarray(valid), big_spec).image)
    np.testing.assert_allclose(big, big_ref, atol=1e-6)


def test_project_compact_exact_matches_project_scan():
    """The two-fat-sort projection+compaction must match project_scan /
    project_scan_compact bit-for-bit, including equal-(pixel, range) ties
    (stable -> smallest point id wins)."""
    from delora_tpu.ops.projection import (
        gather_image_attribute, project_compact_exact, project_scan_compact,
    )

    pts, valid = make_cloud(n=800, seed=13)
    # Inject exact duplicates (same pixel, same range, different payload
    # index) to exercise tie-breaking.
    pts[100] = pts[50]
    pts[101] = pts[50]
    valid[100] = valid[101] = valid[50] = True
    attr = np.arange(800 * 3, dtype=np.float32).reshape(800, 3)

    ref = project_scan(jnp.asarray(pts), jnp.asarray(valid), SPEC)
    ref_attr = gather_image_attribute(jnp.asarray(attr), ref.point_index)
    out = project_compact_exact(
        jnp.asarray(pts), jnp.asarray(valid), SPEC,
        values=jnp.asarray(attr),
    )
    np.testing.assert_array_equal(
        np.asarray(out.image[..., :3]), np.asarray(ref_attr))
    np.testing.assert_array_equal(
        np.asarray(out.image[..., 3]), np.asarray(ref.image[..., 3]))

    # Compaction parity: same winners, same pixel-ascending prefix order.
    comp = project_scan_compact(jnp.asarray(pts), jnp.asarray(valid), SPEC)
    mask = np.asarray(comp.mask)
    np.testing.assert_array_equal(np.asarray(out.comp_mask), mask)
    k = int(mask.sum())
    np.testing.assert_array_equal(
        np.asarray(out.comp_vals)[:k, :3],
        attr[np.asarray(comp.ids)[:k]],
    )


def test_project_compact_exact_dense_cloud():
    """Many candidates per pixel (far beyond any placement window): the
    compaction route must still keep every true winner — the failure mode of
    placing straight from the dedup sort, where a tile's candidate count is
    unbounded."""
    from delora_tpu.ops.projection import project_compact_exact

    rng = np.random.default_rng(21)
    N = 20000                      # SPEC has 8*16 = 128 pixels -> ~150/pixel
    pts = rng.normal(size=(N, 3)).astype(np.float32) * np.array(
        [10.0, 10.0, 1.0], np.float32)
    pts[:, 2] -= 1.0
    valid = np.ones(N, bool)

    ref = project_scan(jnp.asarray(pts), jnp.asarray(valid), SPEC)
    out = project_compact_exact(jnp.asarray(pts), jnp.asarray(valid), SPEC)
    np.testing.assert_array_equal(
        np.asarray(out.image), np.asarray(ref.image))


def test_pallas_placement_matches_xla_packed():
    """project_image_packed_batch: the Pallas chunked placement kernel
    (interpret mode on CPU) is bit-identical to the XLA lax.map placement."""
    from delora_tpu.ops.projection import project_image_packed_batch

    rng = np.random.default_rng(11)
    B, N = 3, 2048
    pts = rng.normal(size=(B, N, 3)).astype(np.float32) * np.array(
        [8.0, 8.0, 0.5], np.float32
    )
    pts[..., 2] -= 1.5
    valid = rng.random((B, N)) > 0.15
    vals = rng.normal(size=(B, N, 6)).astype(np.float32) * 100.0

    ref = project_image_packed_batch(
        jnp.asarray(pts), jnp.asarray(valid), SPEC,
        values=jnp.asarray(vals), smax=N, backend="xla",
    )
    out = project_image_packed_batch(
        jnp.asarray(pts), jnp.asarray(valid), SPEC,
        values=jnp.asarray(vals), smax=N, backend="pallas",
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_pallas_placement_matches_xla_compact_exact():
    """project_compact_exact_batch: Pallas placement == XLA placement, and
    the compacted winners/masks agree, at raw-scan density (duplicates per
    pixel) where only the overflow-free path is exact."""
    from delora_tpu.ops.projection import project_compact_exact_batch

    rng = np.random.default_rng(13)
    B, N = 2, 4096                       # ~32 candidates per pixel
    pts = rng.normal(size=(B, N, 3)).astype(np.float32) * np.array(
        [8.0, 8.0, 0.5], np.float32
    )
    pts[..., 2] -= 1.5
    valid = rng.random((B, N)) > 0.1
    vals = rng.normal(size=(B, N, 3)).astype(np.float32) * 50.0

    ref = project_compact_exact_batch(
        jnp.asarray(pts), jnp.asarray(valid), SPEC,
        values=jnp.asarray(vals), backend="xla",
    )
    out = project_compact_exact_batch(
        jnp.asarray(pts), jnp.asarray(valid), SPEC,
        values=jnp.asarray(vals), backend="pallas",
    )
    np.testing.assert_array_equal(np.asarray(ref.image), np.asarray(out.image))
    np.testing.assert_array_equal(
        np.asarray(ref.comp_vals), np.asarray(out.comp_vals)
    )
    np.testing.assert_array_equal(
        np.asarray(ref.comp_mask), np.asarray(out.comp_mask)
    )


def test_placement_windows_u32_boundary_wrap():
    """Regression (ADVICE r1): with 64512 < H*W <= 65536 and tile=1024 the
    last window boundary key (num_tiles*tile) << 16 used to wrap to 0 in
    uint32, silently zeroing the final pixel tile on the Pallas backend.
    Clamping boundaries to num_pix before the shift fixes it — assert the
    Pallas placement matches XLA and project_scan at such a shape, with
    points deliberately landing in the last tile."""
    from delora_tpu.ops.projection import (
        project_compact_exact_batch,
        project_image_packed_batch,
    )

    spec = ProjectionSpec(
        height=64, width=1020,               # H*W = 65280; 64 tiles of 1024
        fov_down=np.deg2rad(-24.5), fov_up=np.deg2rad(2.0),
        fov_left=np.deg2rad(-179.9), fov_right=np.deg2rad(179.9),
    )
    assert 64512 < spec.height * spec.width < 65536

    rng = np.random.default_rng(29)
    B, N = 2, 8192
    pts = rng.normal(size=(B, N, 3)).astype(np.float32) * np.array(
        [8.0, 8.0, 0.5], np.float32
    )
    pts[..., 2] -= 1.5                        # bias low elevation -> high v
    valid = np.ones((B, N), bool)

    ref_img = np.stack([
        np.asarray(project_scan(jnp.asarray(pts[b]), jnp.asarray(valid[b]), spec).image)
        for b in range(B)
    ])
    # The biased cloud must actually populate the final 1024-pixel tile.
    assert np.abs(ref_img.reshape(B, -1, 4)[:, 64512:]).sum() > 0

    out_c = project_compact_exact_batch(
        jnp.asarray(pts), jnp.asarray(valid), spec, backend="pallas",
    )
    np.testing.assert_array_equal(np.asarray(out_c.image), ref_img)

    # Packed u16-key path (the wrap site): dedup first so smax can't overflow.
    xla = project_image_packed_batch(
        jnp.asarray(pts), jnp.asarray(valid), spec, smax=N, backend="xla",
    )
    pal = project_image_packed_batch(
        jnp.asarray(pts), jnp.asarray(valid), spec, smax=N, backend="pallas",
    )
    np.testing.assert_array_equal(np.asarray(xla), np.asarray(pal))
    # (packed-vs-project_scan winners may differ on near-equal ranges — the
    # documented 16-bit range-key truncation — so only backend parity and
    # a populated final tile are asserted for the packed path.)
    assert np.abs(np.asarray(pal).reshape(B, -1, 4)[:, 64512:]).sum() > 0


def test_placement_overflow_counter():
    """VERDICT r2 item 7: window overflow is surfaced as an on-device count
    (per batch element, number of tiles whose entry run exceeded the active
    backend's window capacity), not an interpret-only warning."""
    from delora_tpu.ops.projection import project_image_packed_batch

    rng = np.random.default_rng(21)
    B, N = 2, 2048
    pts = rng.normal(size=(B, N, 3)).astype(np.float32) * np.array(
        [8.0, 8.0, 0.5], np.float32
    )
    pts[..., 2] -= 1.5
    valid = np.ones((B, N), bool)
    p, v = jnp.asarray(pts), jnp.asarray(valid)

    # smax far below the per-tile entry run -> overflow on both backends.
    _, over_xla = project_image_packed_batch(
        p, v, SPEC, smax=64, backend="xla", return_overflow=True
    )
    assert over_xla.shape == (B,)
    assert (np.asarray(over_xla) >= 1).all()

    _, over_pal = project_image_packed_batch(
        p, v, SPEC, smax=64, backend="pallas", return_overflow=True
    )
    assert (np.asarray(over_pal) >= 1).all()

    # Full-size window -> zero overflow.
    _, over_ok = project_image_packed_batch(
        p, v, SPEC, smax=N, backend="xla", return_overflow=True
    )
    assert (np.asarray(over_ok) == 0).all()
