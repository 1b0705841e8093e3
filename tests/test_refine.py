"""Keypoint-sequence refiner: identity at init, masking, learnability."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from golfaction_tpu import config as cfg_mod
from golfaction_tpu.models import refine as refine_mod
from golfaction_tpu.train import data

CFG = cfg_mod.RefineConfig(enabled=True, block_channels=(8,),
                           temporal_branches=((3, 1),), dtype="float32")


def _sample_kpts(B=2, T=12, seed=0):
    rng = np.random.default_rng(seed)
    ks = []
    for b in range(B):
        s = data.swing_keypoints(T, np.random.default_rng(seed + b))
        s = data.place_in_image(s, (256, 320), person_height_px=160,
                                rng=np.random.default_rng(seed + b))
        ks.append(s.keypoints)
    return jnp.asarray(np.stack(ks))


def test_identity_at_init_and_shapes():
    model = refine_mod.create_refine_model(CFG)
    k = _sample_kpts()
    v = jnp.ones(k.shape[:2], bool)
    params = model.init(jax.random.key(0), k, v)
    out = model.apply(params, k, v)
    assert out.shape == k.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(k), atol=1e-5)


def test_invalid_frames_pass_through():
    model = refine_mod.create_refine_model(CFG)
    k = _sample_kpts(seed=3)
    v = jnp.asarray([[True] * 8 + [False] * 4, [True] * 12])
    params = model.init(jax.random.key(0), k, v)
    # Force a non-identity function, then check invalid frames still copy
    # the input exactly.
    params = jax.tree.map(
        lambda p: p + 0.05 * jnp.ones_like(p), params)
    out = model.apply(params, k, v)
    np.testing.assert_allclose(np.asarray(out[0, 8:]), np.asarray(k[0, 8:]),
                               atol=1e-6)
    assert np.abs(np.asarray(out[1]) - np.asarray(k[1])).max() > 1e-3


def test_learns_inverse_attenuation():
    # Train on (clean + 0.4*(faulty-clean), target=faulty): the refiner must
    # reduce the elbow deflection error vs the identity baseline.
    model = refine_mod.create_refine_model(CFG)
    T = 16

    def pair(seed):
        f = {"chicken_wing": 1.0}
        sf = data.swing_keypoints(T, np.random.default_rng(seed), faults=f)
        sc = data.swing_keypoints(T, np.random.default_rng(seed))
        sf = data.place_in_image(sf, (256, 320), person_height_px=160,
                                 rng=np.random.default_rng(seed))
        sc = data.place_in_image(sc, (256, 320), person_height_px=160,
                                 rng=np.random.default_rng(seed))
        inp = sc.keypoints + 0.4 * (sf.keypoints - sc.keypoints)
        return inp, sf.keypoints

    pairs = [pair(s) for s in range(12)]
    inp = jnp.asarray(np.stack([p[0] for p in pairs]))
    tgt = jnp.asarray(np.stack([p[1] for p in pairs]))
    v = jnp.ones(inp.shape[:2], bool)
    params = model.init(jax.random.key(1), inp, v)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    def loss_fn(p):
        out = model.apply(p, inp, v)
        return jnp.mean((out[..., :2] - tgt[..., :2]) ** 2)

    base = float(loss_fn(params))     # identity-at-init error
    step = jax.jit(lambda p, o: (lambda g: (
        lambda u, no: (optax.apply_updates(p, u), no))(*tx.update(g, o, p)))(
        jax.grad(loss_fn)(p)))
    for _ in range(60):
        params, opt = step(params, opt)
    final = float(loss_fn(params))
    assert final < 0.5 * base, (base, final)
