"""Device-side augmentation profiling (run on the real TPU when the tunnel
is back): times the full dlc AugmentationEngine and ablations so the
per-op cost breakdown is measurable, amortizing RPC by scanning N
applications per dispatch.

    python scripts/profile_augmentation.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/lp_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lightning_pose_tpu.ops.augment import AugmentationEngine  # noqa: E402

B, H, W, K = 16, 256, 256, 17
N_SCAN = 30


def time_engine(label, keep=None, override=None):
    """Build the dlc engine, then null out all spec entries not in
    ``keep`` (internal spec keys) — ablation without touching the
    imgaug-name parser."""
    eng = AugmentationEngine("dlc", H, W)
    if keep is not None:
        eng.spec = {
            k: (v if k in keep else None) for k, v in eng.spec.items()
        }
    if override:
        for k, v in override.items():
            eng.spec[k] = dict(eng.spec[k], **v)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (B, H, W, 3)).astype(np.uint8))
    kps = jnp.asarray(rng.uniform(10, 240, (B, K, 2)).astype(np.float32))

    @jax.jit
    def run_n(key, images, kps):
        def body(carry, k):
            out, kp2 = eng._augment(k, images, kps)
            return carry + jnp.mean(out) + jnp.mean(jnp.nan_to_num(kp2)), 0
        tot, _ = jax.lax.scan(body, 0.0, jax.random.split(key, N_SCAN))
        return tot

    key = jax.random.PRNGKey(0)
    np.asarray(run_n(key, images, kps))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(run_n(key, images, kps))
        best = min(best, time.time() - t0)
    ms = best / N_SCAN * 1000
    print(f"{label:35s} {ms:8.2f} ms/apply")
    return ms


ablations = [
    ("dlc full", None),
    ("null engine (no ops kept)", ()),
    ("warp only (affine)", ("affine",)),
    ("warp+croppad", ("affine", "croppad")),
    ("elastic only", ("elastic",)),
    ("geometric only (warp+elastic)", ("affine", "croppad", "elastic")),
    ("+ motion blur", ("affine", "croppad", "elastic", "motion_blur")),
    ("+ coarse noise", ("affine", "croppad", "elastic", "motion_blur",
                        "coarse_dropout", "coarse_salt", "coarse_pepper")),
    ("motion blur only", ("motion_blur",)),
    ("coarse dropout only", ("coarse_dropout",)),
    ("coarse salt+pepper only", ("coarse_salt", "coarse_pepper")),
    ("histeq only (sparse)", ("histeq",)),
    ("clahe only (sparse)", ("clahe",)),
    ("emboss only", ("emboss",)),
]

print(f"devices: {jax.devices()}")
for label, keep in ablations:
    try:
        time_engine(label, keep)
    except Exception as e:
        print(f"{label}: FAILED {e}")

# dense-vs-sparse comparison: p=1.0 forces the dense branch
time_engine("clahe dense (p=1)", ("clahe",), {"clahe": {"p": 1.0}})
time_engine("histeq dense (p=1)", ("histeq",), {"histeq": {"p": 1.0}})
