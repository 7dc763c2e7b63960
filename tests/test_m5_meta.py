"""M5/M6: meta-gradient correctness on the analytic quadratic family
(SURVEY.md section 4.3), FOMAML vs MAML divergence, task-vmap averaging,
and the sharded meta-step on the 8-device CPU mesh (SURVEY.md section 4.5)."""

import jax
import jax.numpy as jnp
import numpy as np

from metaasr_tpu.meta.maml import MetaAlgoConfig, make_inner_adapt, make_meta_loss, maml_grads


def quad_loss(params, batch, rng, train):
    """0.5 * ||w - c||^2 — inner SGD has closed form."""
    del rng, train
    diff = params["w"] - batch["c"]
    return 0.5 * jnp.sum(diff * diff), {}


def _setup(d=5, k=3, lr=0.1, seed=0):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    c_s = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    c_q = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    # closed form: theta_k = c_s + (1-lr)^k (w - c_s)
    w_k = c_s + (1 - lr) ** k * (w - c_s)
    return w, c_s, c_q, w_k


def test_inner_adapt_closed_form():
    w, c_s, _, w_k_expected = _setup()
    for remat in (False, True):
        cfg = MetaAlgoConfig(inner_lr=0.1, inner_steps=3, first_order=True,
                             remat_inner=remat)
        inner = make_inner_adapt(quad_loss, cfg)
        adapted, s_losses = inner({"w": w}, {"c": c_s}, jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(adapted["w"]),
                                   np.asarray(w_k_expected), rtol=1e-5)
        # support loss at step 0 = loss at the un-adapted params
        np.testing.assert_allclose(float(s_losses[0]),
                                   0.5 * float(jnp.sum((w - c_s) ** 2)),
                                   rtol=1e-5)


def test_fomaml_gradient_analytic():
    """FOMAML outer grad == query grad at the adapted point: (w_k - c_q)."""
    w, c_s, c_q, w_k = _setup()
    cfg = MetaAlgoConfig(inner_lr=0.1, inner_steps=3, first_order=True)
    grad_fn = maml_grads(quad_loss, cfg)
    mb = {"support": {"c": c_s[None]}, "query": {"c": c_q[None]}}
    grads, metrics = grad_fn({"w": w}, mb, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(grads["w"]), np.asarray(w_k - c_q),
                               rtol=1e-5)
    expected_loss = 0.5 * float(jnp.sum((w_k - c_q) ** 2))
    np.testing.assert_allclose(float(metrics["meta_loss"]), expected_loss,
                               rtol=1e-5)


def test_maml_second_order_gradient_analytic():
    """Full MAML grad == (1-lr)^k * (w_k - c_q) — includes the inner-loop
    Jacobian, distinguishing second-order from first-order."""
    lr, k = 0.1, 3
    w, c_s, c_q, w_k = _setup(lr=lr, k=k)
    for remat in (False, True):
        cfg = MetaAlgoConfig(inner_lr=lr, inner_steps=k, first_order=False,
                             remat_inner=remat)
        grad_fn = maml_grads(quad_loss, cfg)
        mb = {"support": {"c": c_s[None]}, "query": {"c": c_q[None]}}
        grads, _ = grad_fn({"w": w}, mb, jax.random.PRNGKey(0))
        expect = (1 - lr) ** k * (w_k - c_q)
        np.testing.assert_allclose(np.asarray(grads["w"]), np.asarray(expect),
                                   rtol=1e-5)
    # and it must differ from FOMAML by exactly the (1-lr)^k factor
    fo = maml_grads(quad_loss, MetaAlgoConfig(inner_lr=lr, inner_steps=k,
                                              first_order=True))
    fo_grads, _ = fo({"w": w}, mb, jax.random.PRNGKey(0))
    ratio = np.asarray(grads["w"]) / np.asarray(fo_grads["w"])
    np.testing.assert_allclose(ratio, (1 - lr) ** k, rtol=1e-4)


def test_unrolled_inner_loop_matches_scan():
    """unroll_inner is a pure scheduling change (it removes XLA while-carry
    copies of the param tree); meta-gradients must be bit-identical to the
    scanned form for BOTH first- and second-order."""
    rng = np.random.default_rng(3)
    mb = {"support": {"c": jnp.asarray(rng.standard_normal((3, 5)), jnp.float32)},
          "query": {"c": jnp.asarray(rng.standard_normal((3, 5)), jnp.float32)}}
    params = {"w": jnp.asarray(rng.standard_normal(5), jnp.float32)}
    for fo in (True, False):
        g_scan, m_scan = maml_grads(
            quad_loss,
            MetaAlgoConfig(0.1, 4, fo, True, unroll_inner=False))(
                params, mb, jax.random.PRNGKey(0))
        g_unr, m_unr = maml_grads(
            quad_loss,
            MetaAlgoConfig(0.1, 4, fo, True, unroll_inner=True))(
                params, mb, jax.random.PRNGKey(0))
        # XLA does not guarantee bit-identical results across scheduling /
        # fusion choices, so tight-tolerance rather than bit-exact
        np.testing.assert_allclose(np.asarray(g_scan["w"]),
                                   np.asarray(g_unr["w"]), rtol=1e-7)
        np.testing.assert_allclose(float(m_scan["meta_loss"]),
                                   float(m_unr["meta_loss"]), rtol=1e-7)


def test_task_vmap_averaging():
    """Outer grad over M tasks == mean of per-task outer grads."""
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal(4).astype(np.float32))
    cs = jnp.asarray(rng.standard_normal((6, 4)).astype(np.float32))
    cq = jnp.asarray(rng.standard_normal((6, 4)).astype(np.float32))
    cfg = MetaAlgoConfig(inner_lr=0.05, inner_steps=2, first_order=False)
    grad_fn = maml_grads(quad_loss, cfg)
    grads_all, _ = grad_fn({"w": w}, {"support": {"c": cs}, "query": {"c": cq}},
                           jax.random.PRNGKey(0))
    per_task = []
    for i in range(6):
        g, _ = grad_fn({"w": w}, {"support": {"c": cs[i: i + 1]},
                                  "query": {"c": cq[i: i + 1]}},
                       jax.random.PRNGKey(0))
        per_task.append(np.asarray(g["w"]))
    np.testing.assert_allclose(np.asarray(grads_all["w"]),
                               np.mean(per_task, axis=0), rtol=1e-5)


def test_meta_step_sharded_equals_single_device():
    """Real pjit on the 8-device CPU mesh: task-sharded meta grads must
    match unsharded numerics (SURVEY.md section 4.5)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from metaasr_tpu.parallel.mesh import make_mesh, replicated

    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    cs = jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32))
    cq = jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32))
    cfg = MetaAlgoConfig(inner_lr=0.05, inner_steps=3, first_order=False)
    grad_fn = maml_grads(quad_loss, cfg)

    ref_grads, _ = grad_fn({"w": w}, {"support": {"c": cs}, "query": {"c": cq}},
                           jax.random.PRNGKey(0))

    mesh = make_mesh(num_task=8)
    assert mesh.shape == {"task": 8, "data": 1}
    task_sh = NamedSharding(mesh, P("task"))
    rep = replicated(mesh)
    sharded_fn = jax.jit(
        lambda p, mb, r: grad_fn(p, mb, r)[0],
        in_shardings=(rep, {"support": {"c": task_sh}, "query": {"c": task_sh}},
                      rep),
        out_shardings=rep)
    got = sharded_fn(
        jax.device_put({"w": w}, rep),
        {"support": {"c": jax.device_put(cs, task_sh)},
         "query": {"c": jax.device_put(cq, task_sh)}},
        jax.device_put(jax.random.PRNGKey(0), rep))
    np.testing.assert_allclose(np.asarray(got["w"]),
                               np.asarray(ref_grads["w"]), rtol=1e-5)


def test_meta_loss_rng_isolation():
    """Each task gets an independent rng; same key => deterministic."""
    def noisy_loss(params, batch, rng, train):
        noise = jax.random.normal(rng, ())
        return 0.5 * jnp.sum((params["w"] - batch["c"]) ** 2) + 0.0 * noise, {}

    cfg = MetaAlgoConfig(inner_lr=0.1, inner_steps=1, first_order=True)
    meta_loss = make_meta_loss(noisy_loss, cfg)
    w = {"w": jnp.ones(3)}
    mb = {"support": {"c": jnp.zeros((2, 3))}, "query": {"c": jnp.zeros((2, 3))}}
    l1, _ = meta_loss(w, mb, jax.random.PRNGKey(1))
    l2, _ = meta_loss(w, mb, jax.random.PRNGKey(1))
    assert float(l1) == float(l2)


def test_reptile_gradient_analytic():
    """Reptile outer grad on the quadratic family: inner SGD on the
    combined (support+query) batch has closed form
        adapted = m + (1-lr)^k (w - m),   m = mean of all targets,
    so the Reptile delta is (1 - (1-lr)^k)(w - m), averaged over tasks."""
    from metaasr_tpu.meta.maml import reptile_grads

    def mquad_loss(params, batch, rng, train):
        del rng, train
        diff = params["w"][None] - batch["c"]          # [k, d]
        return 0.5 * (diff ** 2).sum(-1).mean(), {}

    rng = np.random.default_rng(5)
    d, k, m_tasks, lr, steps = 5, 2, 3, 0.1, 4
    w = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    cs = jnp.asarray(rng.standard_normal((m_tasks, k, d)).astype(np.float32))
    cq = jnp.asarray(rng.standard_normal((m_tasks, k, d)).astype(np.float32))
    mb = {"support": {"c": cs}, "query": {"c": cq}}
    for unroll in (False, True):
        grad_fn = reptile_grads(mquad_loss, MetaAlgoConfig(
            inner_lr=lr, inner_steps=steps, first_order=True,
            unroll_inner=unroll))
        grads, metrics = grad_fn({"w": w}, mb, jax.random.PRNGKey(0))
        m = jnp.concatenate([cs, cq], axis=1).mean(axis=1)   # [M, d]
        expect = ((1 - (1 - lr) ** steps) * (w[None] - m)).mean(axis=0)
        np.testing.assert_allclose(np.asarray(grads["w"]),
                                   np.asarray(expect), rtol=1e-5, atol=1e-6)
        assert np.isfinite(float(metrics["meta_loss"]))


def test_grad_dtype_bf16_meta_step():
    """grad_dtype="bfloat16" runs the meta-step's internals in bf16 (the
    one-convert-per-leaf experiment, meta/maml.py MetaAlgoConfig.grad_dtype)
    but must (a) return gradients in the MASTER dtype (fp32) so the optax
    tree update is exact, (b) agree with the fp32 path to bf16 precision,
    for both maml_grads and reptile_grads."""
    from metaasr_tpu.meta.maml import reptile_grads

    def dquad_loss(params, batch, rng, train):
        # dtype-preserving, batched variant: batch constants follow the
        # param dtype (the ASR loss casts its inputs to the model compute
        # dtype the same way), so the graph really runs in params'
        # precision; batch axis so reptile's support|query concat works
        del rng, train
        diff = params["w"][None] - batch["c"].astype(params["w"].dtype)
        return 0.5 * (diff * diff).sum(-1).mean(), {}

    rng = np.random.default_rng(7)
    d, k, m_tasks = 5, 2, 3
    w = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    cs = jnp.asarray(rng.standard_normal((m_tasks, k, d)).astype(np.float32))
    cq = jnp.asarray(rng.standard_normal((m_tasks, k, d)).astype(np.float32))
    mb = {"support": {"c": cs}, "query": {"c": cq}}
    for make in (maml_grads, reptile_grads):
        base = make(dquad_loss, MetaAlgoConfig(inner_lr=0.1, inner_steps=3,
                                               first_order=True))
        low = make(dquad_loss, MetaAlgoConfig(inner_lr=0.1, inner_steps=3,
                                              first_order=True,
                                              grad_dtype="bfloat16"))
        g32, _ = base({"w": w}, mb, jax.random.PRNGKey(0))
        g16, metrics = low({"w": w}, mb, jax.random.PRNGKey(0))
        assert g16["w"].dtype == jnp.float32           # cast back to master
        # internals actually ran in bf16 (metrics come from the cast graph)
        assert metrics["meta_loss"].dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(g16["w"]), np.asarray(g32["w"]),
                                   rtol=0.05, atol=0.02)  # bf16 ~8-bit mantissa


def test_algo_config_grad_dtype_plumbing():
    """cfg.meta.grad_dtype reaches MetaAlgoConfig: 'float32' maps to None
    (no cast graph at all), anything else passes through verbatim."""
    from metaasr_tpu.config import Config
    from metaasr_tpu.train.meta_train import algo_config

    cfg = Config()
    assert algo_config(cfg).grad_dtype is None
    cfg.meta.grad_dtype = "bfloat16"
    assert algo_config(cfg).grad_dtype == "bfloat16"


def test_inner_clip_bounds_update_and_noop_when_large():
    """inner_clip: when the support gradient's global norm exceeds the
    clip, the inner step displacement is exactly lr*clip along the
    gradient direction; a clip far above the norm reproduces the
    unclipped update bit-for-bit (scale=1 multiply)."""
    w, c_s, _, _ = _setup(d=5, k=1, lr=0.1)
    gnorm = float(jnp.linalg.norm(w - c_s))  # quad grad = w - c

    clip = 0.25 * gnorm
    cfg = MetaAlgoConfig(inner_lr=0.1, inner_steps=1, inner_clip=clip)
    adapted, _ = make_inner_adapt(quad_loss, cfg)(
        {"w": w}, {"c": c_s}, jax.random.PRNGKey(0))
    step = np.asarray(adapted["w"] - w)
    np.testing.assert_allclose(np.linalg.norm(step), 0.1 * clip, rtol=1e-5)
    # direction preserved: step is anti-parallel to the gradient
    g = np.asarray(w - c_s)
    np.testing.assert_allclose(step / np.linalg.norm(step),
                               -g / np.linalg.norm(g), rtol=1e-5)

    big = MetaAlgoConfig(inner_lr=0.1, inner_steps=1, inner_clip=1e9)
    off = MetaAlgoConfig(inner_lr=0.1, inner_steps=1)
    a_big, _ = make_inner_adapt(quad_loss, big)(
        {"w": w}, {"c": c_s}, jax.random.PRNGKey(0))
    a_off, _ = make_inner_adapt(quad_loss, off)(
        {"w": w}, {"c": c_s}, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(a_big["w"]), np.asarray(a_off["w"]),
                               rtol=1e-6)


def test_inner_clip_fomaml_outer_grad_at_clipped_point():
    """Under FOMAML the outer grad must be the query gradient evaluated at
    the CLIPPED adapted point (and the clip scale is stop_gradient'd, so
    no extra terms appear even for second-order MAML on this linear-grad
    family where the analytic Jacobian is (1 - lr*scale)^k)."""
    w, c_s, c_q, _ = _setup(d=5, k=2, lr=0.1)
    gnorm = float(jnp.linalg.norm(w - c_s))
    clip = 0.5 * gnorm

    cfg = MetaAlgoConfig(inner_lr=0.1, inner_steps=2, first_order=True,
                         inner_clip=clip)
    meta_batch = {"support": {"c": c_s[None]}, "query": {"c": c_q[None]}}
    grads, _ = maml_grads(quad_loss, cfg)({"w": w}, meta_batch,
                                          jax.random.PRNGKey(0))
    adapted, _ = make_inner_adapt(quad_loss, cfg)(
        {"w": w}, {"c": c_s}, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(grads["w"]),
                               np.asarray(adapted["w"] - c_q), rtol=1e-5)
