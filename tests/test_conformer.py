"""Conformer encoder (models/conformer.py): rel-pos attention correctness
vs a naive per-pair construction, padding invariance through the conv
module, and meta-learning compatibility (stateless by construction — the
BatchNorm→LayerNorm substitution is the point under test)."""

import jax
import jax.numpy as jnp
import numpy as np

from metaasr_tpu.models.conformer import (
    ConformerEncoder,
    RelPosSelfAttention,
    rel_shift,
    relative_positions,
)
from metaasr_tpu.models.losses import prepare_decoder_targets
from metaasr_tpu.models.transformer import TransformerASR


def test_rel_shift_matches_naive(rng):
    b, h, t = 2, 3, 7
    x = rng.standard_normal((b, h, t, 2 * t - 1)).astype(np.float32)
    out = np.asarray(rel_shift(jnp.asarray(x)))
    want = np.zeros((b, h, t, t), np.float32)
    for q in range(t):
        for s in range(t):
            want[:, :, q, s] = x[:, :, q, (t - 1) + (s - q)]
    np.testing.assert_array_equal(out, want)


def test_relpos_attention_matches_naive(rng):
    """The skewed-einsum rel-pos attention equals a naive implementation
    that materializes r_{t-s} per (query, key) pair."""
    d, heads, t = 16, 2, 9
    attn = RelPosSelfAttention(d_model=d, num_heads=heads)
    x = jnp.asarray(rng.standard_normal((2, t, d)).astype(np.float32))
    bias = jnp.zeros((2, 1, 1, t), jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), x, bias)["params"]
    out = attn.apply({"params": params}, x, bias)

    # naive: project q/k/v and positions with the SAME params, build
    # scores with an explicit [T, T] relative-offset table
    dh = d // heads
    qkv = (jnp.einsum("btd,dchf->btchf", x, params["qkv"]["kernel"])
           + params["qkv"]["bias"])
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    rel = jnp.asarray(relative_positions(t, d))  # [2T-1, D]; row i = T-1-i
    r = jnp.einsum("pd,dhf->phf", rel, params["pos"]["kernel"])
    u, vb = params["u_bias"], params["v_bias"]
    naive = np.zeros((2, heads, t, t), np.float32)
    for qi in range(t):
        for s in range(t):
            r_qs = r[(t - 1) - (qi - s)]  # offset qi-s
            naive[:, :, qi, s] = np.asarray(
                jnp.einsum("bhf,bhf->bh", q[:, qi] + u[None], k[:, s])
                + jnp.einsum("bhf,hf->bh", q[:, qi] + vb[None], r_qs))
    w = jax.nn.softmax(jnp.asarray(naive) / np.sqrt(dh), axis=-1)
    att = jnp.einsum("bhqk,bkhf->bqhf", w, v)
    want = (jnp.einsum("bqhf,hfd->bqd", att, params["out"]["kernel"])
            + params["out"]["bias"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_conformer_encoder_padding_invariance(rng):
    enc = ConformerEncoder(d_model=32, num_heads=2, d_ff=64, num_layers=2,
                           dropout=0.0, kernel_size=7)
    feats = jnp.asarray(rng.standard_normal((2, 35, 80)).astype(np.float32))
    lens = jnp.array([35, 19])
    params = enc.init(jax.random.PRNGKey(0), feats, lens, False)["params"]
    out, out_lens = enc.apply({"params": params}, feats, lens, False)
    assert out.shape == (2, 8, 32)
    assert list(np.asarray(out_lens)) == [8, 4]
    # corrupt padding frames: valid outputs unchanged (attention mask AND
    # the conv module's pre-conv re-zeroing both have to hold)
    feats2 = feats.at[1, 19:].set(7.0)
    out2, _ = enc.apply({"params": params}, feats2, lens, False)
    np.testing.assert_allclose(np.asarray(out[1, :4]), np.asarray(out2[1, :4]),
                               rtol=2e-3, atol=2e-4)
    # padded encoder frames are zeroed for downstream heads
    assert float(jnp.abs(out[1, 4:]).max()) == 0.0


def test_conformer_asr_forward_and_meta_grads(rng):
    """Full model with conformer encoder: joint forward shapes, and a
    vmapped FOMAML meta-gradient runs (pure params — no batch statistics,
    the reason ConvModule uses LayerNorm)."""
    from metaasr_tpu.config import Config
    from metaasr_tpu.meta.maml import MetaAlgoConfig, maml_grads
    from metaasr_tpu.train.task import ASRTask

    cfg = Config()
    cfg.model.encoder = "conformer"
    cfg.model.conformer_kernel = 7
    cfg.model.vocab_size = 12
    cfg.model.d_model = 32
    cfg.model.num_heads = 2
    cfg.model.d_ff = 64
    cfg.model.num_encoder_layers = 2
    cfg.model.num_decoder_layers = 2
    cfg.model.dtype = "float32"
    cfg.model.dropout = 0.0
    cfg.model.ctc_impl = "scan"
    cfg.specaug.enabled = False
    cfg.frontend.use_pallas = False
    cfg.meta.inner_steps = 1
    task = ASRTask(cfg)

    def batch(m, b):
        r = np.random.default_rng(0)
        return {
            "audio": jnp.asarray(0.1 * r.standard_normal((m, b, 4000)),
                                 jnp.float32),
            "audio_lens": jnp.full((m, b), 4000, jnp.int32),
            "tokens": jnp.asarray(r.integers(1, 10, (m, b, 5)), jnp.int32),
            "token_lens": jnp.full((m, b), 5, jnp.int32),
        }

    mb = {"support": batch(2, 2), "query": batch(2, 2)}
    params = task.init_params(jax.random.PRNGKey(0),
                              {k: v[0] for k, v in mb["support"].items()})
    grad_fn = maml_grads(task.loss_fn, MetaAlgoConfig(
        inner_lr=1e-2, inner_steps=1, first_order=True),
        preprocess_fn=task.preprocess)
    grads, metrics = jax.jit(grad_fn)(params, mb, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["meta_loss"]))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # the conformer-specific params got gradients too
    enc = grads["encoder"]["layer_0"]
    assert float(jnp.abs(enc["self_attn"]["u_bias"]).max()) > 0
    assert float(jnp.abs(enc["conv"]["depthwise"]["kernel"]).max()) > 0


def test_conformer_beam_decode_smoke(rng):
    """Beam search runs unchanged on a conformer-encoder model (the search
    only touches encode + decoder surfaces)."""
    from metaasr_tpu.decode.beam_search import (
        BeamSearchConfig,
        beam_search_transformer,
    )

    model = TransformerASR(vocab_size=12, d_model=32, num_heads=2, d_ff=64,
                           num_encoder_layers=2, num_decoder_layers=2,
                           dropout=0.0, encoder_type="conformer",
                           conformer_kernel=7)
    feats = jnp.asarray(rng.standard_normal((2, 35, 80)).astype(np.float32))
    lens = jnp.array([35, 19])
    tokens = jnp.asarray(rng.integers(1, 10, (2, 4)).astype(np.int32))
    tin, _, _ = prepare_decoder_targets(tokens, jnp.array([4, 4]), 11)
    params = model.init(jax.random.PRNGKey(0), feats, lens, tin,
                        jnp.array([5, 5]))["params"]
    cfg = BeamSearchConfig(beam_size=3, max_len=8, ctc_weight=0.3)
    out = beam_search_transformer(model, params, feats, lens, 11, cfg)
    assert out["tokens"].shape[:2] == (2, 3)
    assert np.all(np.asarray(out["lengths"]) >= 0)
    best = np.asarray(out["scores"])[:, 0]
    assert np.all(np.isfinite(best))


def test_depthwise_conv_matches_grouped_nn_conv(rng):
    """DepthwiseConv1d (shifted-sum form) ≡ nn.Conv(feature_group_count=C)
    in forward AND gradients. The CPU lowering of the grouped conv is
    correct (only its TPU vmapped-gradient lowering is broken — the reason
    the shifted-sum form exists; docs/DESIGN.md section 8), so nn.Conv is a
    valid golden here."""
    import flax.linen as nn

    from metaasr_tpu.models.conformer import DepthwiseConv1d

    b, t, c, k = 3, 17, 8, 7
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    dw = DepthwiseConv1d(features=c, kernel_size=k)
    params = dw.init(jax.random.PRNGKey(0), x)["params"]
    ref = nn.Conv(c, (k,), padding="SAME", feature_group_count=c)
    assert params["kernel"].shape == (k, 1, c)  # layout parity with nn.Conv

    def loss_new(p, x):
        return jnp.sum(jnp.sin(dw.apply({"params": p}, x)))

    def loss_ref(p, x):
        return jnp.sum(jnp.sin(ref.apply({"params": p}, x)))

    np.testing.assert_allclose(
        np.asarray(dw.apply({"params": params}, x)),
        np.asarray(ref.apply({"params": params}, x)), rtol=1e-5, atol=1e-5)
    g_new = jax.grad(loss_new, argnums=(0, 1))(params, x)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_new),
                     jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)
    # even kernel size: padding split lo=(k-1)//2 / hi=rest must also match
    dw6 = DepthwiseConv1d(features=c, kernel_size=6)
    p6 = dw6.init(jax.random.PRNGKey(1), x)["params"]
    ref6 = nn.Conv(c, (6,), padding="SAME", feature_group_count=c)
    np.testing.assert_allclose(
        np.asarray(dw6.apply({"params": p6}, x)),
        np.asarray(ref6.apply({"params": p6}, x)), rtol=1e-5, atol=1e-5)


def test_conv_module_vmap_grad_matches_loop(rng):
    """Gradients of the conv module under a task-style vmap equal the
    per-item python loop (the exact property whose violation on TPU broke
    conformer meta-training; this CPU pin guards the module's ops against
    reintroducing a primitive with a bad batching rule)."""
    from metaasr_tpu.models.conformer import ConvModule

    m, b, t, c = 3, 2, 11, 8
    mod = ConvModule(d_model=c, kernel_size=7, dropout=0.0)
    x = jnp.asarray(rng.standard_normal((m, b, t, c)).astype(np.float32))
    mask = jnp.ones((m, b, t, 1), bool)
    params = mod.init(jax.random.PRNGKey(0), x[0], mask[0], False)["params"]

    def item_loss(p, xi, mi):
        return jnp.sum(jnp.abs(mod.apply({"params": p}, xi, mi, False)))

    def vmapped(p):
        return jax.vmap(item_loss, in_axes=(None, 0, 0))(p, x, mask).mean()

    g_v = jax.grad(vmapped)(params)
    acc = None
    for i in range(m):
        gi = jax.grad(item_loss)(params, x[i], mask[i])
        acc = gi if acc is None else jax.tree_util.tree_map(jnp.add, acc, gi)
    g_l = jax.tree_util.tree_map(lambda g: g / m, acc)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_v),
                     jax.tree_util.tree_leaves(g_l)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)


def test_conformer_masked_region_gradient_bounded(rng):
    """Regression for the LayerNorm-backward trap (docs/DESIGN.md sec 7):
    a SpecAugment-style zeroed time region used to map (through the
    zero-init subsample projection) to an exactly-constant feature vector,
    whose LayerNorm backward scales by 1/sqrt(eps) ~ 1e3 — measured bias
    grad rms 4.7e4 vs kernel rms 0.15 before the PE variance floor was
    added. The floor must keep the masked-region gradient in the same
    range as the unmasked one."""
    enc = ConformerEncoder(d_model=32, num_heads=2, d_ff=64, num_layers=2,
                           dropout=0.0, kernel_size=7)
    feats = rng.standard_normal((2, 48, 80)).astype(np.float32)
    feats[:, 16:32] = 0.0  # time-masked region INSIDE the valid length
    feats = jnp.asarray(feats)
    lens = jnp.array([48, 48])
    params = enc.init(jax.random.PRNGKey(0), feats, lens, False)["params"]

    def loss(p):
        out, _ = enc.apply({"params": p}, feats, lens, False)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)
    proj = g["subsample"]["proj"]

    def rms(x):
        return float(jnp.sqrt(jnp.mean(x ** 2)))

    bias_rms, kernel_rms = rms(proj["bias"]), rms(proj["kernel"])
    # before the fix the bias/kernel grad ratio was ~3e5; with the
    # variance floor both gradients sit within ~2 orders of magnitude
    assert bias_rms < 100.0 * max(kernel_rms, 1e-6), (bias_rms, kernel_rms)
