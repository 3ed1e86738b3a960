"""Model component tests: parameter parity, shapes, and semantic properties.

Parameter counts are asserted EXACTLY against the reference's recorded
numbers (reference Notebooks/SwinVox.ipynb cell 47 logs: encoder 40,339,770
with single-stage swin + CVA; decoder 3,817,944; refiner 34,880,352; merger
17,877) — these pin the architecture to the reference layer-for-layer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swinvox_tpu.models import SwinVoxModel
from swinvox_tpu.models.cross_view import CrossViewAttention
from swinvox_tpu.models.decoder import Decoder
from swinvox_tpu.models.encoder import Encoder
from swinvox_tpu.models.merger import Merger
from swinvox_tpu.models.refiner import Refiner
from swinvox_tpu.models.swin import (
    SwinTiny,
    relative_position_index,
    shifted_window_mask,
)
from swinvox_tpu.ops.window_attention import window_attention_xla


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def randomize(params, key, scale=0.05):
    """Replace near-zero reference-init params with random values so
    property tests exercise non-trivial compute."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    new = [
        jax.random.normal(k, l.shape, l.dtype) * scale
        for k, l in zip(keys, leaves)
    ]
    return jax.tree.unflatten(treedef, new)


# ---------------------------------------------------------------- params


def test_decoder_param_count():
    vs = jax.eval_shape(
        lambda k: Decoder().init(k, jnp.zeros((1, 1, 7, 7, 256)), False),
        jax.random.PRNGKey(0),
    )
    assert n_params(vs["params"]) == 3_817_944


def test_merger_param_count():
    vs = jax.eval_shape(
        lambda k: Merger().init(
            k, jnp.zeros((1, 2, 32, 32, 32, 9)), jnp.zeros((1, 2, 32, 32, 32)), False
        ),
        jax.random.PRNGKey(0),
    )
    assert n_params(vs["params"]) == 17_877


def test_refiner_param_count():
    vs = jax.eval_shape(
        lambda k: Refiner().init(k, jnp.zeros((1, 32, 32, 32)), False),
        jax.random.PRNGKey(0),
    )
    assert n_params(vs["params"]) == 34_880_352


def test_encoder_param_count_single_stage():
    """The configuration whose count the reference recorded (40,339,770)."""
    enc = Encoder(use_swin_multi_stage=False, swin_stages=(3,))
    vs = jax.eval_shape(
        lambda k: enc.init(k, jnp.zeros((1, 1, 224, 224, 3)), False),
        jax.random.PRNGKey(0),
    )
    assert n_params(vs["params"]) == 40_339_770


def test_encoder_param_count_multi_stage():
    """Default config (multi-stage + CVA): hand-derived from the reference
    architecture: trunk 8,543,296 + swin 27,517,818 + stage norms 1,128,960
    + reduces/downsamples 4,175,616 + CVA 791,936 + fusion/layers 2,952,192."""
    enc = Encoder()
    vs = jax.eval_shape(
        lambda k: enc.init(k, jnp.zeros((1, 1, 224, 224, 3)), False),
        jax.random.PRNGKey(0),
    )
    assert n_params(vs["params"]) == 45_109_818


# ------------------------------------------------------- window attention


def test_window_attention_matches_numpy_reference(rng):
    nw, heads, t, d = 4, 3, 49, 32
    q = rng.standard_normal((nw, heads, t, d), dtype=np.float32)
    k = rng.standard_normal((nw, heads, t, d), dtype=np.float32)
    v = rng.standard_normal((nw, heads, t, d), dtype=np.float32)
    bias = rng.standard_normal((heads, t, t), dtype=np.float32)
    mask = rng.choice([0.0, -100.0], size=(2, t, t)).astype(np.float32)

    out = np.asarray(
        window_attention_xla(*map(jnp.asarray, (q, k, v, bias, mask)))
    )

    # plain numpy reference
    scores = np.einsum("whtd,whsd->whts", q, k) / np.sqrt(d)
    scores = scores + bias[None]
    scores = scores.reshape(2, 2, heads, t, t) + mask[None, :, None]
    scores = scores.reshape(nw, heads, t, t)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    expected = np.einsum("whts,whsd->whtd", probs, v)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_relative_position_index_properties():
    idx = relative_position_index(7)
    assert idx.shape == (49, 49)
    assert idx.min() >= 0 and idx.max() < 169
    # symmetric pairs map to mirrored relative offsets: idx[i,j] determined
    # by (ri-rj, ci-cj); check center token vs its right neighbor
    assert idx[0, 0] == (6 * 13 + 6)  # zero offset -> center of table


def test_shifted_window_mask_blocks_cross_region():
    mask = shifted_window_mask(14, 14, 7, 3)
    assert mask.shape == (4, 49, 49)
    # first window (top-left) is entirely one region -> fully visible
    assert np.all(mask[0] == 0)
    # the bottom-right window mixes 4 regions -> has blocked pairs
    assert (mask[-1] == -100.0).any()
    # mask is symmetric
    np.testing.assert_array_equal(mask[-1], mask[-1].transpose(0, 2, 1) if mask[-1].ndim == 3 else mask[-1].T)


# ---------------------------------------------------------- components


def test_swin_stage_shapes():
    model = SwinTiny(dtype=jnp.float32)
    x = jnp.zeros((1, 224, 224, 3))
    init_fn = jax.jit(lambda k: model.init(k, x, False))
    variables = init_fn(jax.random.PRNGKey(0))
    feats = jax.jit(lambda v: model.apply(v, x, False))(variables)
    shapes = [f.shape for f in feats]
    assert shapes == [
        (1, 56, 56, 96),
        (1, 28, 28, 192),
        (1, 14, 14, 384),
        (1, 7, 7, 768),
    ]


def test_swin_resizes_non_224_inputs(rng):
    """Non-224 inputs are bilinear-resized before the backbone (reference
    swin_transformer.py:74-75), so any input size yields the 224 grid
    shapes and parameters are shared across input sizes."""
    model = SwinTiny(dtype=jnp.float32, depths=(1, 1, 1, 1))
    x224 = jnp.asarray(
        rng.standard_normal((1, 224, 224, 3)).astype(np.float32)
    )
    variables = jax.jit(lambda k: model.init(k, x224, False))(
        jax.random.PRNGKey(0)
    )
    x192 = jnp.asarray(
        rng.standard_normal((2, 192, 192, 3)).astype(np.float32)
    )
    feats = jax.jit(lambda v, x: model.apply(v, x, False))(variables, x192)
    assert [f.shape for f in feats] == [
        (2, 56, 56, 96),
        (2, 28, 28, 192),
        (2, 14, 14, 384),
        (2, 7, 7, 768),
    ]
    # the resize itself matches torch interpolate(align_corners=False)
    torch = pytest.importorskip("torch")
    small = rng.standard_normal((1, 100, 100, 3)).astype(np.float32)
    ours = np.asarray(
        jax.image.resize(jnp.asarray(small), (1, 224, 224, 3), "bilinear")
    )
    theirs = (
        torch.nn.functional.interpolate(
            torch.from_numpy(small).permute(0, 3, 1, 2),
            size=(224, 224),
            mode="bilinear",
            align_corners=False,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_merger_preserves_agreeing_views(rng):
    """Softmax view weights sum to 1: when all views predict the same
    volume, the merged volume must equal it exactly."""
    merger = Merger(dtype=jnp.float32)
    raw = jnp.asarray(rng.standard_normal((2, 3, 32, 32, 32, 9), dtype=np.float32))
    vol = rng.standard_normal((2, 1, 32, 32, 32), dtype=np.float32)
    coarse = jnp.asarray(np.broadcast_to(vol, (2, 3, 32, 32, 32)))
    variables = jax.jit(lambda k: merger.init(k, raw, coarse, False))(
        jax.random.PRNGKey(0)
    )
    params = randomize(variables["params"], jax.random.PRNGKey(1))
    merged = merger.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        raw, coarse, False,
    )
    np.testing.assert_allclose(np.asarray(merged), vol[:, 0], rtol=1e-4, atol=1e-5)


def test_cross_view_attention_view_equivariance(rng):
    """Permuting views permutes the output: attention over views has no
    positional encoding and BatchNorm stats span all views."""
    cva = CrossViewAttention(dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 4, 7, 7, 512), dtype=np.float32))
    variables = jax.jit(lambda k: cva.init(k, x, False))(jax.random.PRNGKey(0))
    params = randomize(variables["params"], jax.random.PRNGKey(1))
    vs = {"params": params, "batch_stats": variables["batch_stats"]}
    perm = jnp.asarray([2, 0, 3, 1])
    out = cva.apply(vs, x, False)
    out_perm = cva.apply(vs, x[:, perm], False)
    np.testing.assert_allclose(
        np.asarray(out_perm), np.asarray(out)[:, perm], rtol=1e-4, atol=1e-5
    )


def test_cross_view_attention_single_view_identity(rng):
    """At n_views == 1 the CVA skips the score/softmax/mix einsums
    (softmax over a singleton view axis is exactly 1.0 — models/
    cross_view.py).  Duplicating the view exercises the FULL einsum
    path, whose algebra reduces identically (uniform softmax over equal
    scores; 0.5*v + 0.5*v == v exactly in fp), so the two must agree;
    and the q/k slices of the qkv projection must receive exactly-zero
    gradients, keeping the training trajectory unchanged vs the full
    computation."""
    cva = CrossViewAttention(dtype=jnp.float32)
    x1 = jnp.asarray(rng.standard_normal((2, 1, 7, 7, 512), dtype=np.float32))
    variables = jax.jit(lambda k: cva.init(k, x1, False))(jax.random.PRNGKey(0))
    params = randomize(variables["params"], jax.random.PRNGKey(1))
    vs = {"params": params, "batch_stats": variables["batch_stats"]}
    out1 = cva.apply(vs, x1, False)
    out2 = cva.apply(vs, jnp.concatenate([x1, x1], axis=1), False)
    np.testing.assert_allclose(
        np.asarray(out2[:, 0]), np.asarray(out1[:, 0]), rtol=1e-6, atol=1e-7
    )

    def loss(p):
        y = cva.apply(
            {"params": p, "batch_stats": variables["batch_stats"]}, x1, False
        )
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss))(params)
    gk = np.asarray(g["qkv_conv"]["Conv_0"]["kernel"])  # [1,1,512,3*reduced]
    reduced = 512 // 4
    np.testing.assert_array_equal(gk[..., : 2 * reduced], 0.0)
    assert np.abs(gk[..., 2 * reduced :]).max() > 0.0


def test_decoder_shapes_and_logit_channel(rng):
    dec = Decoder(dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 3, 7, 7, 256), dtype=np.float32))
    variables = jax.jit(lambda k: dec.init(k, x, False))(jax.random.PRNGKey(0))
    raw, coarse = dec.apply(variables, x, False)
    assert raw.shape == (2, 3, 32, 32, 32, 9)
    assert coarse.shape == (2, 3, 32, 32, 32)
    # channel 9 of raw IS the coarse logits (reference decoder.py:89-93)
    np.testing.assert_array_equal(np.asarray(raw[..., 8]), np.asarray(coarse))


def test_refiner_shape_and_residual_blend(rng):
    ref = Refiner(dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 32), dtype=np.float32))
    variables = jax.jit(lambda k: ref.init(k, x, False))(jax.random.PRNGKey(0))
    out = ref.apply(variables, x, False)
    assert out.shape == (2, 32, 32, 32)
    # with reference init the reconstruction branch is ~0 on the final
    # tconv, so out ~= input/2 + eps — check the blend structure holds
    assert np.isfinite(np.asarray(out)).all()


def test_full_model_forward_shapes():
    model = SwinVoxModel(dtype=jnp.float32)
    x = jnp.zeros((1, 2, 224, 224, 3))
    variables = jax.jit(lambda k: model.init(k, x, train=False))(
        jax.random.PRNGKey(0)
    )
    out = jax.jit(lambda v: model.apply(v, x, train=False))(variables)
    assert out["coarse_volumes"].shape == (1, 2, 32, 32, 32)
    assert out["merged_volumes"].shape == (1, 32, 32, 32)
    assert out["refined_volumes"].shape == (1, 32, 32, 32)
    # param tree has exactly the four reference module groups
    assert set(variables["params"].keys()) == {
        "encoder", "decoder", "merger", "refiner",
    }
