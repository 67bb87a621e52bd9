"""On-device batched augmentation engine — the imgaug/DALI replacement.

Reproduces the semantics of the reference's imgaug presets
(reference lightning_pose/data/augmentations.py:109-227: "dlc", "dlc-lr",
"dlc-top-down", "dlc-mv") as one fused, jittable, batched transform:

- All geometric ops — Rot90, Affine rotation (±25°, p=0.4), CropAndPad
  (±15% per side, p=0.4, folded with the final Resize), horizontal flip —
  compose into a single per-image 3x3 matrix; elastic deformation
  (alpha~U(0,10), sigma=5, p=0.5) adds a smooth displacement field; and
  MotionBlur (k=5, angle ±90°, p=0.5) becomes 5 averaged taps along the blur
  direction. The image is sampled **once** (bilinear, zero fill) over the
  composed grid — one gather for the whole geometric pipeline instead of
  imgaug's sequential per-op CPU passes.
- Photometric ops (CoarseDropout, CoarseSalt/Pepper, histogram
  equalization, CLAHE-style clip-limited equalization, Emboss) run as
  vectorized batch ops with per-image application masks.
- Keypoints ride the inverse matrix (plus elastic displacement lookup);
  horizontal flips swap _left/_right keypoint identities via a precomputed
  index array (reference datasets.py:175-232).

Known divergence from imgaug (documented, tolerance-level): photometric ops
apply after the full geometric warp rather than interleaved between
geometric ops. CLAHE is true tiled cv2 CLAHE (per-tile clip-limited
histograms + bilinear LUT interpolation, verified against
cv2.createCLAHE within ~1.5 gray levels); the tile grid count is fixed
per spec (default 16) rather than imgaug's per-image sampled pixel size.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from lightning_pose_tpu.ops.pallas_clahe import (
    clahe_apply_pallas,
    pallas_clahe_supported,
)

__all__ = ["AugmentationEngine", "grid_sample_bilinear", "warp_bilinear"]


# ------------------------------------------------------------------------------
# sampling primitives
# ------------------------------------------------------------------------------


def grid_sample_bilinear(images: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample ``images (B, H, W, C)`` at ``coords (B, Ho, Wo, 2)`` (x, y)
    with bilinear interpolation and zero padding outside."""
    b, h, w, c = images.shape
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi = jnp.clip(xi, 0, w - 1)
        yi = jnp.clip(yi, 0, h - 1)
        bidx = jnp.arange(b).reshape(b, 1, 1)
        vals = images[bidx, yi, xi]  # (B, Ho, Wo, C)
        return vals * valid[..., None]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def warp_bilinear(images: jax.Array, coords: jax.Array,
                  row_span_bound: float | None = None) -> jax.Array:
    """``grid_sample_bilinear`` with the TPU fast path.

    On TPU with %128-aligned dims the 4-tap gather (per-element on TPU,
    ~39 ms at bs16/256px — the augmentation bottleneck) is replaced by the
    one-hot-matmul Pallas kernel (ops/pallas_warp.py); identical zero-pad
    bilinear semantics up to bf16 weight rounding. ``row_span_bound`` (a
    static bound on the sampled-row span within one kernel tile, see
    ``_warp_row_span_bound``) enables the kernel's windowed contraction.
    """
    if jax.default_backend() == "tpu":
        from lightning_pose_tpu.ops.pallas_warp import (
            pallas_warp_supported,
            warp_bilinear_pallas,
        )

        if pallas_warp_supported(images.shape, coords.shape):
            return warp_bilinear_pallas(
                images, coords, row_span_bound=row_span_bound
            )
    return grid_sample_bilinear(images, coords)


def _warp_row_span_bound(spec: dict, hflip: bool) -> float | None:
    """Static bound on ``max(py) - min(py)`` over one (8, 128) warp-kernel
    output tile, from the pipeline's geometric magnitudes.

    The sampling coords are ``inverse_affine @ grid + elastic``. The
    inverse's linear part is Rot(-phi) @ diag(+-1/sx, 1/sy) (hflip/croppad
    scales commute through as column scalings), so
    ``|dpy/dx| <= max|sin phi| * s`` and ``|dpy/dy| <= max|cos phi| * s``
    with ``s = 1 + 2*croppad_pct`` the largest inverse scale, plus
    ``2*alpha_hi`` from the elastic displacement. None when the pipeline
    has no geometric ops at all (identity warp; the windowed kernel
    degenerates anyway, but None keeps the no-op case obvious).
    """
    has_geo = any(
        spec[k] is not None for k in ("rot90", "affine", "croppad", "elastic")
    ) or hflip or spec["fliplr"] is not None
    if not has_geo:
        return None
    # the bound below models rotation-only affines, isotropic croppad
    # scaling, and alpha-bounded elastic displacement; if a later pipeline
    # adds imgaug-style affine scale/shear/translate (or new croppad/elastic
    # magnitudes) this bound would silently under-cover and the windowed
    # warp kernel would drop in-frame taps — fail loudly instead
    for op, allowed in (("affine", {"p", "rotate"}),
                        ("croppad", {"p", "percent"}),
                        ("elastic", {"p", "alpha", "sigma"})):
        if spec[op] is not None and not set(spec[op]) <= allowed:
            raise NotImplementedError(
                f"_warp_row_span_bound does not model {op} keys "
                f"{sorted(set(spec[op]) - allowed)}; extend the bound or "
                f"pass row_span_bound=None to disable the windowed kernel"
            )
    br, bw = 8.0, 128.0  # pallas_warp tile shape
    s = 1.0
    if spec["croppad"] is not None:
        s += 2.0 * float(spec["croppad"]["percent"])
    max_sin, max_cos = 0.0, 1.0
    if spec["affine"] is not None:
        theta = min(abs(float(spec["affine"]["rotate"])), 90.0) * np.pi / 180.0
        max_sin = float(np.sin(theta))
    if spec["rot90"] is not None and any(
        int(k) % 2 == 1 for k in spec["rot90"]["k"]
    ):
        max_sin = 1.0  # odd-k 90-degree rotations transpose the axes
    elastic = 0.0
    if spec["elastic"] is not None:
        elastic = 2.0 * float(spec["elastic"]["alpha"][1])
    return s * (max_sin * (bw - 1.0) + max_cos * (br - 1.0)) + elastic


def _blur_band_matrix(n: int, sigma: float) -> np.ndarray:
    """(n, n) banded matrix applying a zero-padded Gaussian along one axis."""
    radius = int(3 * sigma)
    xs = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-(xs**2) / (2 * sigma**2))
    k /= k.sum()
    d = np.subtract.outer(np.arange(n), np.arange(n))  # d[i, j] = i - j
    band = np.where(np.abs(d) <= radius, k[np.clip(d + radius, 0, 2 * radius)], 0.0)
    return band.astype(np.float32)


def _separable_gaussian_blur(field: jax.Array, sigma: float) -> jax.Array:
    """Blur ``(B, H, W, C)`` with a fixed-sigma separable Gaussian.

    Expressed as two banded-matrix matmuls instead of depthwise convs: the
    31-tap separable conv runs on the TPU VPU and measured ~1.6 ms per
    bs16/256px elastic field, while the equivalent (H, H)/(W, W) band
    matmuls ride the MXU for ~2 GFLOP. HIGHEST precision keeps f32
    conv-equivalent numerics (zero padding, same taps).
    """
    b, h, w, c = field.shape
    bh = jnp.asarray(_blur_band_matrix(h, sigma))
    bw = jnp.asarray(_blur_band_matrix(w, sigma))
    hp = jax.lax.Precision.HIGHEST
    out = jnp.einsum("ij,bjwc->biwc", bh, field, precision=hp)
    out = jnp.einsum("xu,biuc->bixc", bw, out, precision=hp)
    return out


# ------------------------------------------------------------------------------
# affine helpers (3x3 homogeneous, acting on (x, y, 1))
# ------------------------------------------------------------------------------


def _identity(b: int) -> jax.Array:
    return jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (b, 1, 1))


def _rotation_about_center(theta: jax.Array, h: int, w: int) -> jax.Array:
    """Forward keypoint matrix for rotation by theta about the image center."""
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    b = theta.shape[0]
    zeros = jnp.zeros_like(cos)
    ones = jnp.ones_like(cos)
    # T(c) @ R @ T(-c)
    m = jnp.stack(
        [
            jnp.stack([cos, -sin, cx - cos * cx + sin * cy], axis=-1),
            jnp.stack([sin, cos, cy - sin * cx - cos * cy], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return m.reshape(b, 3, 3)


def _rot90_matrix(k: jax.Array, h: int, w: int) -> jax.Array:
    """Forward keypoint matrix for k*90° rotations (square images)."""
    theta = -k.astype(jnp.float32) * (np.pi / 2.0)
    # imgaug Rot90 rotates counter-clockwise in array space; for keypoint
    # parity at this granularity the exact direction convention only flips
    # which of the k values is sampled — behaviorally equivalent
    return _rotation_about_center(theta, h, w)


def _croppad_matrix(percents: jax.Array, h: int, w: int) -> jax.Array:
    """Forward keypoint matrix for CropAndPad(percent per side) + Resize back
    to (h, w). ``percents`` (B, 4) = (top, right, bottom, left); positive =
    pad, negative = crop (imgaug convention)."""
    top, right, bottom, left = (
        percents[:, 0], percents[:, 1], percents[:, 2], percents[:, 3]
    )
    # region in input coords spans x in [-left*w, w + right*w)
    x0 = -left * w
    y0 = -top * h
    new_w = w * (1.0 + left + right)
    new_h = h * (1.0 + top + bottom)
    sx = w / new_w
    sy = h / new_h
    b = percents.shape[0]
    zeros = jnp.zeros_like(sx)
    ones = jnp.ones_like(sx)
    m = jnp.stack(
        [
            jnp.stack([sx, zeros, -x0 * sx], axis=-1),
            jnp.stack([zeros, sy, -y0 * sy], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return m.reshape(b, 3, 3)


def _hflip_matrix(flip: jax.Array, h: int, w: int) -> jax.Array:
    sx = jnp.where(flip, -1.0, 1.0)
    tx = jnp.where(flip, jnp.float32(w - 1), 0.0)
    b = flip.shape[0]
    zeros = jnp.zeros_like(sx)
    ones = jnp.ones_like(sx)
    m = jnp.stack(
        [
            jnp.stack([sx, zeros, tx], axis=-1),
            jnp.stack([zeros, ones, zeros], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return m.reshape(b, 3, 3)


# ------------------------------------------------------------------------------
# photometric ops
# ------------------------------------------------------------------------------


def _coarse_mask(rng, b, h, w, drop_p, size_percent) -> jax.Array:
    """Low-res boolean drop mask upsampled to (b, h, w, 1); True = keep."""
    lh = max(1, int(h * size_percent))
    lw = max(1, int(w * size_percent))
    low = jax.random.uniform(rng, (b, lh, lw, 1)) >= drop_p
    return jax.image.resize(low.astype(jnp.float32), (b, h, w, 1), "nearest") > 0.5


def _equalize_hist(images: jax.Array, clip_limit: jax.Array | None = None) -> jax.Array:
    """Per-image per-channel histogram equalization on 0-255 floats.

    With ``clip_limit`` (multiple of the mean bin count), histogram bins are
    clipped and the excess redistributed — a global approximation of CLAHE.

    TPU note: scatter (bincount) / per-pixel gather (take_along_axis)
    lower to serial element ops on TPU, and 256-bin compare/accumulate
    loops cost ~805M VPU compares at bs16/256px (~7-10 ms). Instead the
    8-bit value splits into two nibbles whose 16-wide one-hots outer-multiply
    to the exact 256-bin one-hot, so BOTH the histogram and the LUT apply
    become MXU matmuls over 16-wide one-hot operands:

        counts[hi, lo] = sum_i oh_hi[i, hi] * oh_lo[i, lo]     (contraction
                         over pixels — exact 0/1 products, f32 accum)
        eq[i] = sum_lo (oh_hi @ lut2)[i, lo] * oh_lo[i, lo]    (lut2 is the
                         LUT reshaped (16, 16))

    Constructing the (N, 16) one-hots costs 16x fewer compares than the
    256-bin forms; lut values ride bf16 (<=0.5 gray rounding, below cv2's
    equalizeHist integer rounding).
    """
    b, h, w, c = images.shape
    vals = jnp.clip(images, 0, 255).astype(jnp.int32)
    flat = vals.transpose(0, 3, 1, 2).reshape(b, c, -1)  # (B, C, N)
    nib = jnp.arange(16, dtype=jnp.int32)
    oh_hi = ((flat[..., None] >> 4) == nib).astype(jnp.bfloat16)  # (B,C,N,16)
    oh_lo = ((flat[..., None] & 15) == nib).astype(jnp.bfloat16)

    counts = jnp.einsum(
        "bcnh,bcnl->bchl", oh_hi, oh_lo,
        preferred_element_type=jnp.float32,
    ).reshape(b, c, 256)  # exact: 0/1 products accumulated in f32
    if clip_limit is not None:
        limit = clip_limit[:, None, None] * jnp.mean(counts, axis=-1, keepdims=True)
        excess = jnp.sum(jnp.maximum(counts - limit, 0.0), axis=-1, keepdims=True)
        counts = jnp.minimum(counts, limit) + excess / 256.0
    cdf = jnp.cumsum(counts, axis=-1)
    cdf_min = cdf[..., :1]
    denom = jnp.maximum(cdf[..., -1:] - cdf_min, 1.0)
    lut = jnp.clip((cdf - cdf_min) / denom * 255.0, 0, 255)  # (B, C, 256)

    # (the fused Pallas LUT kernel was tried here and measured SLOWER than
    # this nibble-matmul form: a shared per-image LUT makes the apply an
    # MXU problem, and the VPU one-hot lookup can't compete — see
    # ops/pallas_clahe.py, which pays off only for CLAHE's per-column
    # interpolated tables)
    lut2 = lut.reshape(b, c, 16, 16).astype(jnp.bfloat16)
    rows = jnp.einsum(
        "bcnh,bchl->bcnl", oh_hi, lut2,
        preferred_element_type=jnp.float32,
    )  # (B, C, N, 16): LUT row selected by the high nibble
    eq = jnp.sum(rows * oh_lo.astype(jnp.float32), axis=-1)  # (B, C, N)
    return eq.reshape(b, c, h, w).transpose(0, 2, 3, 1)


def _clahe_lut_grid(x: jax.Array, clip_limit: jax.Array, g: int) -> jax.Array:
    """Per-tile clip-limited LUTs for tiled CLAHE: ``x (B, C, H, W)`` int32
    values 0-255, returns ``(B, C, g, g, 256)`` f32 LUTs.

    Histograms reuse the nibble-split MXU trick of :func:`_equalize_hist`.
    The clip follows cv2's exact integer clip + redistribution (clahe.cpp):
    limit = max(int(clipLimit * tile_area / 256), 1); the clipped mass
    spreads as floor(clipped/256) to EVERY bin plus +1 to the first
    ``residual`` bins at stride max(256//residual, 1). The integer residual
    pass matters: per-tile histograms are sparse, so for small clip limits
    most of the mass moves through it (a uniform float redistribution lands
    ~30 gray levels away from cv2; this form lands within ~2).
    """
    b, c, h, w = x.shape
    th, tw = h // g, w // g
    n = th * tw
    nib = jnp.arange(16, dtype=jnp.int32)
    tiles = (
        x.reshape(b, c, g, th, g, tw)
        .transpose(0, 1, 2, 4, 3, 5)
        .reshape(b, c, g * g, n)
    )
    oh_hi = ((tiles[..., None] >> 4) == nib).astype(jnp.bfloat16)
    oh_lo = ((tiles[..., None] & 15) == nib).astype(jnp.bfloat16)
    counts = jnp.einsum(
        "bctnh,bctnl->bcthl", oh_hi, oh_lo,
        preferred_element_type=jnp.float32,
    ).reshape(b, c, g * g, 256)
    limit = jnp.maximum(
        jnp.floor(clip_limit[:, None, None, None] * n / 256.0), 1.0
    )
    clipped = jnp.sum(jnp.maximum(counts - limit, 0.0), axis=-1, keepdims=True)
    redist = jnp.floor(clipped / 256.0)
    residual = clipped - redist * 256.0  # integer-valued, in [0, 256)
    step = jnp.maximum(jnp.floor(256.0 / jnp.maximum(residual, 1.0)), 1.0)
    bins = jnp.arange(256, dtype=jnp.float32)
    bump = (
        (jnp.mod(bins, step) == 0) & (jnp.floor(bins / step) < residual)
    ).astype(jnp.float32)
    counts = jnp.minimum(counts, limit) + redist + bump
    cdf = jnp.cumsum(counts, axis=-1)
    return jnp.clip(cdf * (255.0 / n), 0.0, 255.0).reshape(b, c, g, g, 256)


def _equalize_clahe_tiled(
    images: jax.Array, clip_limit: jax.Array, grid: int = 16
) -> jax.Array:
    """Tiled CLAHE (cv2.createCLAHE semantics) on 0-255 floats.

    Contrast-limited equalization with per-tile histograms and bilinear
    interpolation between the four nearest tile LUTs — the reference's
    imgaug ``AllChannelsCLAHE`` wraps exactly this cv2 algorithm
    (reference augmentations.py:203-205).

    TPU mapping: per-tile histograms reuse the nibble-split MXU trick of
    :func:`_equalize_hist`. The interpolation avoids per-pixel gathers by
    the HALF-BLOCK identity: split every tile into 2x2 half-blocks — the
    four neighbor-tile indices ``(floor((r-1)/2), floor((r-1)/2)+1)`` are
    CONSTANT within each half-block (only the bilinear weights vary, and
    those are a static (H, W) map). So the four corner LUTs gather at
    half-block granularity (a tiny static take over the tile grid) and
    each corner's LUT application is one batched nibble matmul over the
    half-block pixels. cv2's edge behavior falls out for free: clamped
    corner indices coincide at the borders, making the weights moot there.
    """
    b, h, w, c = images.shape
    g = int(grid)
    if g <= 1 or h % (2 * g) or w % (2 * g):
        # dims don't split into half-blocks: global clip-limited fallback
        return _equalize_hist(images, clip_limit=clip_limit)
    vals = jnp.clip(images, 0, 255).astype(jnp.int32)
    x = vals.transpose(0, 3, 1, 2)  # (B, C, H, W)
    lut_grid = _clahe_lut_grid(x, clip_limit, g)

    # --- LUT blend: fused Pallas kernel on TPU ---------------------------
    # the XLA half-block form below round-trips ~50 MB of one-hot/LUT-row
    # intermediates per image-channel through HBM; the kernel keeps the
    # blend in VMEM (ops/pallas_clahe.py) and measured ~4x faster at the
    # augmentation engine's sparse group size
    if jax.default_backend() == "tpu" and pallas_clahe_supported(h, w, g):
        out = clahe_apply_pallas(
            x.reshape(b * c, h, w).astype(jnp.float32),
            lut_grid.reshape(b * c, g, g, 256),
            g,
        )
        return out.reshape(b, c, h, w).transpose(0, 2, 3, 1)

    # --- half-block corner LUTs -----------------------------------------
    th, tw = h // g, w // g
    nib = jnp.arange(16, dtype=jnp.int32)
    r = jnp.arange(2 * g)
    lo = jnp.clip((r - 1) // 2, 0, g - 1)
    hi = jnp.clip((r - 1) // 2 + 1, 0, g - 1)

    def take_rc(iy, ix):
        t = jnp.take(lut_grid, iy, axis=2)  # (B, C, 2g, g, 256)
        t = jnp.take(t, ix, axis=3)  # (B, C, 2g, 2g, 256)
        return t.reshape(b, c, 4 * g * g, 16, 16).astype(jnp.bfloat16)

    corner_luts = [take_rc(lo, lo), take_rc(lo, hi),
                   take_rc(hi, lo), take_rc(hi, hi)]

    # --- apply the 4 corner LUTs over half-block pixels ------------------
    hh, hw = th // 2, tw // 2
    nb = hh * hw
    blocks = (
        x.reshape(b, c, 2 * g, hh, 2 * g, hw)
        .transpose(0, 1, 2, 4, 3, 5)
        .reshape(b, c, 4 * g * g, nb)
    )
    boh_hi = ((blocks[..., None] >> 4) == nib).astype(jnp.bfloat16)
    boh_lo = ((blocks[..., None] & 15) == nib).astype(jnp.float32)
    corner_vals = []
    for lut2 in corner_luts:
        rows = jnp.einsum(
            "bcqnh,bcqhl->bcqnl", boh_hi, lut2,
            preferred_element_type=jnp.float32,
        )
        corner_vals.append(jnp.sum(rows * boh_lo, axis=-1))  # (B,C,Q,nb)

    def unblock(v):
        return (
            v.reshape(b, c, 2 * g, 2 * g, hh, hw)
            .transpose(0, 1, 2, 4, 3, 5)
            .reshape(b, c, h, w)
        )

    # static bilinear weights: fractional position between tile centers
    wy = jnp.mod((jnp.arange(h, dtype=jnp.float32) + 0.5) / th - 0.5, 1.0)
    wx = jnp.mod((jnp.arange(w, dtype=jnp.float32) + 0.5) / tw - 0.5, 1.0)
    w00 = (1 - wy)[:, None] * (1 - wx)[None, :]
    w01 = (1 - wy)[:, None] * wx[None, :]
    w10 = wy[:, None] * (1 - wx)[None, :]
    w11 = wy[:, None] * wx[None, :]
    out = (
        w00 * unblock(corner_vals[0])
        + w01 * unblock(corner_vals[1])
        + w10 * unblock(corner_vals[2])
        + w11 * unblock(corner_vals[3])
    )
    return out.transpose(0, 2, 3, 1)


def _apply_per_group(
    images: jax.Array,
    apply_g: jax.Array,
    t: int,
    fn,
    extras: tuple = (),
    max_groups: int | None = None,
) -> jax.Array:
    """Apply a per-image op only where its Bernoulli flag fired.

    ``images`` is (B*T, H, W, C) in T-frame groups sharing the (B,) flags
    ``apply_g`` (context stacks share one transform per sample). ``fn``
    maps (n, H, W, C) images (+ per-frame ``extras``) to same-shape images
    and must be per-image independent (no cross-image reductions).

    Rare ops (p~0.1) cost full-batch compute when applied branchlessly.
    Here at most ``m`` fired groups are gathered, transformed, and
    scattered back; a ``lax.cond`` falls back to the dense full-batch form
    on the ~1% of steps where more than ``m`` groups fire, so semantics
    are exactly the branchless ones on every step.
    """
    b = int(apply_g.shape[0])
    if max_groups is None:
        # covers Binomial(b, 0.1) draws with ~99% probability at b>=16
        max_groups = max(1, b // 8 + 2)
    m = min(b, max_groups)

    def _rep(x):
        return jnp.repeat(x, t, axis=0) if t > 1 else x

    def dense(imgs):
        full = fn(imgs, *(_rep(e) for e in extras))
        return jnp.where(_rep(apply_g)[:, None, None, None], full, imgs)

    if m >= b:  # small batches: dense is cheaper than gather + cond
        return dense(images)

    idx_g = jnp.argsort(~apply_g)[:m]  # fired groups first (stable sort)
    count = jnp.sum(apply_g)

    def sparse(imgs):
        if t > 1:
            fi = (idx_g[:, None] * t + jnp.arange(t)[None, :]).reshape(-1)
        else:
            fi = idx_g
        # m is small and static: gather/scatter the fired rows with
        # dynamic-slice / dynamic-update-slice chains instead of gather /
        # scatter HLOs — TPU executes the former natively while the latter
        # lower to per-element loops (measured ~1.5 ms per sparse op at
        # bs16/256px). Selection is exact, so sparse == dense bitwise.
        n = int(fi.shape[0])
        sub = jnp.stack(
            [jax.lax.dynamic_index_in_dim(imgs, fi[k], 0, keepdims=False)
             for k in range(n)]
        )
        res = fn(sub, *(_rep(e[idx_g]) for e in extras))
        keep = _rep(apply_g[idx_g])
        out = imgs
        for k in range(n):
            row = jnp.where(keep[k], res[k], sub[k])
            out = jax.lax.dynamic_update_index_in_dim(out, row, fi[k], 0)
        return out

    return jax.lax.cond(count <= m, sparse, dense, images)


def _emboss(images: jax.Array, alpha: jax.Array, strength: jax.Array) -> jax.Array:
    """imgaug-style emboss: overlay embossed image with per-image alpha.

    imgaug's effect kernel is ``[[-1-s, -s, 0], [-s, 1, s], [0, s, 1+s]]``
    (reference augmentations.py Emboss; cv2.filter2D = correlation with
    BORDER_CONSTANT here). With per-image ``s`` the 3x3 applies as seven
    shifted multiply-adds on a zero-padded copy — a depthwise
    ``feature_group_count=3`` conv pads the 3-channel lane dim ~42x on TPU
    and measured ~3 ms/apply at bs16/256px; the shifted form is a fused
    elementwise pass.
    """
    h, w = images.shape[1], images.shape[2]
    s = strength[:, None, None, None]
    padded = jnp.pad(images, ((0, 0), (1, 1), (1, 1), (0, 0)))

    def sh(ky: int, kx: int) -> jax.Array:
        return padded[:, ky:ky + h, kx:kx + w, :]

    embossed = (
        (-1.0 - s) * sh(0, 0)
        - s * sh(0, 1)
        - s * sh(1, 0)
        + sh(1, 1)
        + s * sh(1, 2)
        + s * sh(2, 1)
        + (1.0 + s) * sh(2, 2)
    )
    a = alpha[:, None, None, None]
    return jnp.clip((1 - a) * images + a * embossed, 0, 255)


# ------------------------------------------------------------------------------
# the engine
# ------------------------------------------------------------------------------



# ------------------------------------------------------------------------------
# pipeline spec
# ------------------------------------------------------------------------------


def build_spec(pipeline: str | dict | None) -> dict:
    """Normalize a preset string or an imgaug-style per-transform dict
    (reference augmentations.py:12-106) into the engine's parameter spec.

    Each key is an optional transform; None disables it. Unknown transforms
    in a user dict raise (fail fast, like the reference's imgaug getattr).
    """
    spec: dict = {
        "rot90": None,          # {"p", "k": [choices]}
        "affine": None,         # {"p", "rotate": deg}
        "croppad": None,        # {"p", "percent"}
        "elastic": None,        # {"p", "alpha": (lo, hi), "sigma"}
        "motion_blur": None,    # {"p", "k", "angle": deg}
        "coarse_dropout": None, # {"p", "drop", "size", "per_channel"}
        "coarse_salt": None,    # {"p", "drop", "size"}
        "coarse_pepper": None,  # {"p", "drop", "size"}
        "histeq": None,         # {"p"}
        "clahe": None,          # {"p", "clip": (lo, hi), "tiles": grid (0=global)}
        "emboss": None,         # {"p", "alpha": (lo, hi), "strength": (lo, hi)}
        "fliplr": None,         # {"p"} — imgaug Fliplr (plain mirror, no swap)
    }
    if pipeline is None or pipeline in ("default", "none"):
        return spec
    if isinstance(pipeline, str):
        if not pipeline.startswith("dlc"):
            raise NotImplementedError(
                f"cfg.training.imgaug string {pipeline} must be a preset "
                "(default/none/dlc/dlc-lr/dlc-top-down/dlc-mv) or a dict"
            )
        # dlc presets (reference augmentations.py:136-221)
        if pipeline == "dlc-lr":
            spec["rot90"] = {"p": 1.0, "k": [0, 2]}
        elif pipeline == "dlc-top-down":
            spec["rot90"] = {"p": 1.0, "k": [0, 1, 2, 3]}
        geometric = not pipeline.endswith("mv")
        if geometric:
            spec["affine"] = {"p": 0.4, "rotate": 25.0}
            spec["croppad"] = {"p": 0.4, "percent": 0.15}
            spec["elastic"] = {"p": 0.5, "alpha": (0.0, 10.0), "sigma": 5.0}
        spec["motion_blur"] = {"p": 0.5, "k": 5, "angle": 90.0}
        spec["coarse_dropout"] = {
            "p": 0.5, "drop": 0.02, "size": 0.3, "per_channel": 0.5
        }
        spec["coarse_salt"] = {"p": 0.5, "drop": 0.01, "size": 0.075}
        spec["coarse_pepper"] = {"p": 0.5, "drop": 0.01, "size": 0.075}
        spec["histeq"] = {"p": 0.1}
        spec["clahe"] = {"p": 0.1, "clip": (1.0, 8.0)}
        spec["emboss"] = {"p": 0.1, "alpha": (0.0, 0.5), "strength": (0.5, 1.5)}
        return spec

    # imgaug-style dict (reference augmentations.py:12-106)
    import logging

    logger = logging.getLogger(__name__)

    def _rng_mag(value, default):
        """imgaug ranges come as (lo, hi) or scalars; return magnitude."""
        if value is None:
            return default
        if isinstance(value, (list, tuple)):
            return float(max(abs(v) for v in value))
        return float(abs(value))

    def _rng_pair(value, default):
        if value is None:
            return default
        if isinstance(value, (list, tuple)) and len(value) == 2:
            return (float(value[0]), float(value[1]))
        v = float(value)
        return (v, v)

    for name, args in dict(pipeline).items():
        args = args or {}
        prob = float(args.get("p", 0.5))
        kwargs = dict(args.get("kwargs", {}) or {})
        if prob == 0.0:
            continue
        if name == "Rot90":
            k = kwargs.get("k", [0, 1, 2, 3])
            if isinstance(k, (list, tuple)) and len(k) == 1                     and isinstance(k[0], (list, tuple)):
                choices = list(k[0])
            elif isinstance(k, (list, tuple)) and len(k) == 2:
                choices = list(range(int(k[0]), int(k[1]) + 1))
            elif isinstance(k, (list, tuple)):
                choices = [int(v) for v in k]
            else:
                choices = [int(k)]
            spec["rot90"] = {"p": prob, "k": choices}
        elif name == "Affine":
            spec["affine"] = {
                "p": prob, "rotate": _rng_mag(kwargs.get("rotate"), 25.0)
            }
        elif name == "Fliplr":
            spec["fliplr"] = {"p": prob}
        elif name == "MotionBlur":
            spec["motion_blur"] = {
                "p": prob,
                "k": int(kwargs.get("k", 5)),
                "angle": _rng_mag(kwargs.get("angle"), 90.0),
            }
        elif name == "CoarseDropout":
            size = kwargs.get("size_percent", 0.3)
            if isinstance(size, (list, tuple)):
                size = float(sum(size) / len(size))
            spec["coarse_dropout"] = {
                "p": prob,
                "drop": float(kwargs.get("p", 0.02)),
                "size": float(size),
                "per_channel": float(kwargs.get("per_channel", 0.0)),
            }
        elif name in ("CoarseSalt", "CoarsePepper"):
            size = kwargs.get("size_percent", 0.075)
            if isinstance(size, (list, tuple)):
                size = float(sum(size) / len(size))
            key = "coarse_salt" if name == "CoarseSalt" else "coarse_pepper"
            spec[key] = {
                "p": prob,
                "drop": float(kwargs.get("p", 0.01)),
                "size": float(size),
            }
        elif name == "ElasticTransformation":
            spec["elastic"] = {
                "p": prob,
                "alpha": _rng_pair(kwargs.get("alpha"), (0.0, 10.0)),
                "sigma": float(
                    kwargs.get("sigma", 5.0)
                    if not isinstance(kwargs.get("sigma"), (list, tuple))
                    else sum(kwargs["sigma"]) / 2
                ),
            }
        elif name == "AllChannelsHistogramEqualization":
            spec["histeq"] = {"p": prob}
        elif name == "AllChannelsCLAHE":
            spec["clahe"] = {
                "p": prob,
                "clip": _rng_pair(kwargs.get("clip_limit"), (1.0, 8.0)),
                # tile grid count per side (cv2 tileGridSize); 0 = global
                "tiles": int(kwargs.get("tiles", 16)),
            }
        elif name == "Emboss":
            spec["emboss"] = {
                "p": prob,
                "alpha": _rng_pair(kwargs.get("alpha"), (0.0, 0.5)),
                "strength": _rng_pair(kwargs.get("strength"), (0.5, 1.5)),
            }
        elif name == "CropAndPad":
            pct = kwargs.get("percent", 0.15)
            spec["croppad"] = {"p": prob, "percent": _rng_mag(pct, 0.15)}
        elif name == "Resize":
            pass  # images are already resized on host
        else:
            # fail fast like the reference (imgaug getattr raises
            # AttributeError for unknown names, augmentations.py:95):
            # silently skipping would train under a different augmentation
            # distribution than the config states
            raise NotImplementedError(
                f"unsupported augmentation transform '{name}'; supported "
                "names: Rot90, Affine, Fliplr, MotionBlur, CoarseDropout, "
                "CoarseSalt, CoarsePepper, ElasticTransformation, "
                "AllChannelsHistogramEqualization, AllChannelsCLAHE, "
                "Emboss, CropAndPad, Resize"
            )
    return spec

class AugmentationEngine:
    """Batched, jittable augmentation from a preset string or an
    imgaug-style per-transform dict."""

    def __init__(
        self,
        pipeline: str | dict | None,
        image_height: int,
        image_width: int,
        hflip: bool = False,
        hflip_swap_indices: np.ndarray | None = None,
    ) -> None:
        self.pipeline = pipeline if pipeline is not None else "default"
        self.spec = build_spec(self.pipeline)
        self.h = int(image_height)
        self.w = int(image_width)
        self.hflip = hflip
        self.swap_indices = (
            jnp.asarray(hflip_swap_indices)
            if hflip_swap_indices is not None
            else None
        )
        # photometric dlc-style stack present?
        self.is_dlc = self.spec["motion_blur"] is not None or any(
            self.spec[k] is not None
            for k in ("coarse_dropout", "coarse_salt", "coarse_pepper",
                      "histeq", "clahe", "emboss")
        )
        self.identity = all(v is None for v in self.spec.values()) and not hflip
        self._call = jax.jit(self._augment)

    def __call__(
        self,
        rng: jax.Array,
        images: jax.Array,
        keypoints: jax.Array,
        visibility: jax.Array | None = None,
    ):
        """images (B, H, W, 3) or (B, T, H, W, 3) uint8/float 0-255;
        keypoints (B, K, 2); optional visibility (B, K) 0/1/2 flags.

        Context stacks (5D input) receive ONE transform per sample applied
        to all T frames (the reference seeds imgaug identically per frame,
        reference datasets.py:292-300).

        Returns (augmented images 0-255 float32, transformed keypoints), plus
        the visibility — reindexed through the hflip swap on flipped samples,
        lockstep with the keypoints (reference datasets.py:338) — when one
        was passed.
        """
        if self.identity:
            out = (images.astype(jnp.float32), keypoints)
            return out if visibility is None else (*out, visibility)
        return self._call(rng, images, keypoints, visibility)

    # everything below runs traced -------------------------------------------------

    def _augment(self, rng, images, keypoints, visibility=None):
        if images.ndim == 5:
            bsz, t = images.shape[0], images.shape[1]
            images = images.reshape(bsz * t, *images.shape[2:])
        else:
            bsz, t = images.shape[0], 1
        b = bsz  # number of transform groups

        def R(p):
            """Repeat a per-group quantity across a group's frames."""
            return jnp.repeat(p, t, axis=0) if t > 1 else p

        h, w = self.h, self.w
        images = images.astype(jnp.float32)
        # one key per independent draw; keys[14..16] feed the three
        # per-channel CoarseDropout masks, so nothing else may reuse them
        keys = jax.random.split(rng, 28)

        spec = self.spec
        forward = _identity(b)  # keypoint matrix: new = F @ old

        if spec["rot90"] is not None:
            # Rot90 (reference augmentations.py:138-144)
            choices = jnp.asarray(spec["rot90"]["k"])
            apply = jax.random.uniform(keys[27], (b,)) < spec["rot90"]["p"]
            k = choices[jax.random.randint(keys[0], (b,), 0, len(spec["rot90"]["k"]))]
            k = jnp.where(apply, k, 0)
            forward = _rot90_matrix(k, h, w) @ forward

        if spec["affine"] is not None:
            # Affine rotation (reference augmentations.py:146-149)
            rot = spec["affine"]["rotate"]
            apply_rot = jax.random.uniform(keys[1], (b,)) < spec["affine"]["p"]
            theta = jax.random.uniform(
                keys[2], (b,), minval=-rot, maxval=rot
            ) * (np.pi / 180.0)
            theta = jnp.where(apply_rot, theta, 0.0)
            forward = _rotation_about_center(theta, h, w) @ forward

        if spec["croppad"] is not None:
            # CropAndPad per side (reference augmentations.py:216-221)
            pct = spec["croppad"]["percent"]
            apply_cp = jax.random.uniform(keys[3], (b,)) < spec["croppad"]["p"]
            percents = jax.random.uniform(keys[4], (b, 4), minval=-pct, maxval=pct)
            percents = jnp.where(apply_cp[:, None], percents, 0.0)
            forward = _croppad_matrix(percents, h, w) @ forward

        if self.hflip or spec["fliplr"] is not None:
            flip_p = 0.5 if self.hflip else spec["fliplr"]["p"]
            flip = jax.random.uniform(keys[5], (b,)) < flip_p
            forward = _hflip_matrix(flip, h, w) @ forward
        else:
            flip = jnp.zeros((b,), dtype=bool)

        # inverse matrix drives image sampling: in = F^-1 @ out
        inverse = jnp.linalg.inv(forward)
        # static sampled-row-span bound for the windowed Pallas warp
        span_bound = _warp_row_span_bound(spec, self.hflip)

        # base output grid
        ys, xs = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32),
            jnp.arange(w, dtype=jnp.float32),
            indexing="ij",
        )
        grid = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)  # (H, W, 3)
        coords = jnp.einsum("bij,hwj->bhwi", R(inverse), grid)[..., :2]  # (B*T,H,W,2)

        # elastic displacement (reference augmentations.py:191-198)
        if spec["elastic"] is not None:
            alo, ahi = spec["elastic"]["alpha"]
            apply_el = jax.random.uniform(keys[6], (b,)) < spec["elastic"]["p"]
            alpha = jax.random.uniform(keys[7], (b,), minval=alo, maxval=ahi)
            alpha = jnp.where(apply_el, alpha, 0.0)
            raw = jax.random.uniform(keys[8], (b, h, w, 2), minval=-1.0, maxval=1.0)
            disp = _separable_gaussian_blur(raw, sigma=spec["elastic"]["sigma"])
            disp = disp * alpha[:, None, None, None]
            coords = coords + R(disp)
        else:
            disp = None

        # motion blur (reference augmentations.py:151-157): a normalized
        # k-tap line kernel along a random direction. Applied as ONE
        # depthwise conv with per-image directional kernels AFTER the warp
        # (batch folded into conv channel groups) instead of k extra warp
        # gathers — gathers are the TPU bottleneck (k=5 taps measured
        # 188 ms/step vs 39 for a single warp at bs16/256px); the blur
        # moving from input to output space is within the documented
        # photometric-after-warp divergence.
        if spec["motion_blur"] is not None:
            mb = spec["motion_blur"]
            ang = mb["angle"]
            apply_mb = jax.random.uniform(keys[9], (b,)) < mb["p"]
            mb_angle = jax.random.uniform(
                keys[10], (b,), minval=-ang, maxval=ang
            ) * (np.pi / 180.0)
            dx = jnp.where(apply_mb, jnp.cos(mb_angle), 0.0)  # (b,)
            dy = jnp.where(apply_mb, jnp.sin(mb_angle), 0.0)
            ksz = int(mb["k"])
            half = (ksz - 1) // 2
            # bilinear-splat the k taps along (dx, dy) onto a k x k kernel
            taps = jnp.arange(-half, half + 1, dtype=jnp.float32)  # (k,)
            tx = taps[None, :] * dx[:, None]  # (b, k)
            ty = taps[None, :] * dy[:, None]
            gg = jnp.arange(-half, half + 1, dtype=jnp.float32)  # grid
            wxk = jnp.maximum(0.0, 1.0 - jnp.abs(tx[:, :, None] - gg))  # (b, k, k)
            wyk = jnp.maximum(0.0, 1.0 - jnp.abs(ty[:, :, None] - gg))
            kern = jnp.einsum("bty,btx->byx", wyk, wxk) / float(ksz)  # (b, k, k)

            # sample the warp with replicate-clamped coords (imgaug/cv2 use
            # reflect borders — zero-outside taps would darken a k/2-px
            # frame), blur, then re-apply the zero-outside warp mask
            cx = jnp.clip(coords[..., 0:1], 0.0, float(w - 1))
            cy = jnp.clip(coords[..., 1:2], 0.0, float(h - 1))
            clamped = jnp.concatenate([cx, cy], axis=-1)
            in_bounds = (
                (coords[..., 0:1] >= -0.5) & (coords[..., 0:1] <= w - 0.5)
                & (coords[..., 1:2] >= -0.5) & (coords[..., 1:2] <= h - 0.5)
            ).astype(images.dtype)
            warped = warp_bilinear(images, clamped, row_span_bound=span_bound)
            bt, c_ = warped.shape[0], warped.shape[-1]
            # per-image kernels via channel groups: (1, H, W, B*T*C) input,
            # one k x k kernel per group
            x_g = warped.transpose(1, 2, 0, 3).reshape(1, h, w, bt * c_)
            x_g = jnp.pad(
                x_g, ((0, 0), (half, half), (half, half), (0, 0)), mode="edge"
            )
            kern_g = R(kern)  # (bt, k, k): one kernel per frame group
            rhs = jnp.repeat(
                kern_g.transpose(1, 2, 0)[:, :, :, None], c_, axis=3
            ).reshape(ksz, ksz, 1, bt * c_).astype(x_g.dtype)
            blurred = jax.lax.conv_general_dilated(
                x_g, rhs, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=bt * c_,
            )
            warped = (
                blurred.reshape(h, w, bt, c_).transpose(2, 0, 1, 3) * in_bounds
            )
        else:
            warped = warp_bilinear(images, coords, row_span_bound=span_bound)

        # keypoints through the forward matrix
        kp_h = jnp.concatenate(
            [keypoints, jnp.ones_like(keypoints[..., :1])], axis=-1
        )
        kp_new = jnp.einsum("bij,bkj->bki", forward, kp_h)[..., :2]
        if disp is not None:
            # sample displacement at the transformed keypoint location
            kxi = jnp.clip(kp_new[..., 0].astype(jnp.int32), 0, w - 1)
            kyi = jnp.clip(kp_new[..., 1].astype(jnp.int32), 0, h - 1)
            bidx = jnp.arange(b)[:, None]
            kp_disp = disp[bidx, kyi, kxi]  # (B, K, 2)
            kp_new = kp_new - kp_disp
        if self.hflip and self.swap_indices is not None:
            swapped = kp_new[:, self.swap_indices, :]
            kp_new = jnp.where(flip[:, None, None], swapped, kp_new)
            if visibility is not None:
                # visibility flags ride the same identity swap as the
                # keypoints (reference datasets.py:338)
                visibility = jnp.where(
                    flip[:, None], visibility[:, self.swap_indices], visibility
                )
        # keypoints warped out of the frame are lost (imgaug removes them);
        # mark with NaN so heatmap targets become zero maps
        nan_mask = (keypoints != keypoints).any(axis=-1, keepdims=True)
        oob = (
            (kp_new[..., 0:1] < -0.5) | (kp_new[..., 0:1] > w - 0.5)
            | (kp_new[..., 1:2] < -0.5) | (kp_new[..., 1:2] > h - 0.5)
        )
        kp_new = jnp.where(nan_mask | oob, jnp.nan, kp_new)

        # ---- photometric stack ----
        out = warped
        if spec["coarse_dropout"] is not None:
            cd = spec["coarse_dropout"]
            apply_cd = R(jax.random.uniform(keys[11], (b,)) < cd["p"])
            mask1 = R(_coarse_mask(keys[12], b, h, w, cd["drop"], cd["size"]))
            per_ch = R(jax.random.uniform(keys[13], (b,)) < cd["per_channel"])
            mask_c = R(
                jnp.concatenate(
                    [
                        _coarse_mask(keys[14 + i], b, h, w, cd["drop"], cd["size"])
                        for i in range(3)
                    ],
                    axis=-1,
                )
            )
            drop_mask = jnp.where(per_ch[:, None, None, None], mask_c, mask1)
            keep = jnp.where(apply_cd[:, None, None, None], drop_mask, True)
            out = out * keep

        if spec["coarse_salt"] is not None:
            cs = spec["coarse_salt"]
            apply_salt = R(jax.random.uniform(keys[17], (b,)) < cs["p"])
            salt = R(~_coarse_mask(keys[18], b, h, w, cs["drop"], cs["size"]))
            out = jnp.where(apply_salt[:, None, None, None] & salt, 255.0, out)
        if spec["coarse_pepper"] is not None:
            cp = spec["coarse_pepper"]
            apply_pep = R(jax.random.uniform(keys[19], (b,)) < cp["p"])
            pep = R(~_coarse_mask(keys[20], b, h, w, cp["drop"], cp["size"]))
            out = jnp.where(apply_pep[:, None, None, None] & pep, 0.0, out)

        # histeq/CLAHE fire per image with p~0.1 — apply on a gathered
        # subset of fired images instead of the whole batch (exact, with a
        # dense lax.cond fallback when many fire; see _apply_per_group)
        if spec["histeq"] is not None:
            apply_he = jax.random.uniform(keys[21], (b,)) < spec["histeq"]["p"]
            out = _apply_per_group(out, apply_he, t, _equalize_hist)

        if spec["clahe"] is not None:
            clo, chi = spec["clahe"]["clip"]
            apply_cl = jax.random.uniform(keys[22], (b,)) < spec["clahe"]["p"]
            clip = jax.random.uniform(keys[24], (b,), minval=clo, maxval=chi)
            grid = int(spec["clahe"].get("tiles", 16))
            out = _apply_per_group(
                out, apply_cl, t,
                lambda sub, cl_sub: _equalize_clahe_tiled(
                    sub, clip_limit=cl_sub, grid=grid
                ),
                extras=(clip,),
            )

        if spec["emboss"] is not None:
            # emboss fires with p~0.1 like histeq/CLAHE — same sparse
            # gathered-subset application (the dense depthwise conv over
            # the full batch measured ~3 ms/apply at bs16/256px)
            em = spec["emboss"]
            apply_em = jax.random.uniform(keys[23], (b,)) < em["p"]
            em_alpha = jnp.where(
                apply_em,
                jax.random.uniform(
                    keys[25], (b,), minval=em["alpha"][0], maxval=em["alpha"][1]
                ),
                0.0,
            )
            em_strength = jax.random.uniform(
                keys[26], (b,), minval=em["strength"][0],
                maxval=em["strength"][1],
            )
            out = _apply_per_group(
                out, apply_em, t, _emboss, extras=(em_alpha, em_strength)
            )

        if t > 1:
            out = out.reshape(bsz, t, h, w, -1)
        if visibility is None:
            return out, kp_new
        return out, kp_new, visibility
