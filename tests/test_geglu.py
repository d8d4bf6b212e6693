"""Fused GeGLU kernel: parity with the unfused composition + gradients."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu
from scipy.special import erf as scipy_erf

from open_provence_tpu.ops.geglu import (
    _erf_approx,
    _geglu_reference,
    fused_geglu,
    geglu_supported,
)


def test_geglu_supported():
    assert geglu_supported(512, 768, 1152, 2)
    assert not geglu_supported(100, 768, 1152, 2)   # rows not tileable
    assert not geglu_supported(512, 700, 1152, 2)   # K not lane-aligned
    assert not geglu_supported(512, 768, 1100, 2)   # I not lane-aligned
    assert not geglu_supported(512, 768, 1152, 2, "tanh")  # unknown act


def test_erf_approx_accuracy():
    """Eigen rational erf: a few fp32 ulps of the true erf, and within
    fp32 rounding of XLA's own lowering."""
    x = np.linspace(-6.0, 6.0, 20001, dtype=np.float64)
    xs = jnp.asarray(x, jnp.float32)
    ours = np.asarray(_erf_approx(xs), np.float64)
    assert np.max(np.abs(ours - scipy_erf(x))) < 1e-6
    jax_erf = np.asarray(jax.scipy.special.erf(xs), np.float64)
    assert np.max(np.abs(ours - jax_erf)) < 1e-6


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("act", ["gelu", "gelu_pytorch_tanh", "silu"])
def test_geglu_matches_reference(dtype, act):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(256, 128)), dtype=dtype)
    wi = jnp.asarray(rng.normal(size=(128, 256)) * 0.05, dtype=dtype)
    with pltpu.force_tpu_interpret_mode():
        out = fused_geglu(x, wi, act)
    ref = _geglu_reference(x, wi, act)
    assert out.dtype == dtype
    atol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=atol, rtol=atol
    )


def test_geglu_gradients_match_reference():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(128, 128)), dtype=jnp.float32)
    wi = jnp.asarray(rng.normal(size=(128, 256)) * 0.05, dtype=jnp.float32)

    def loss_fused(x_, w_):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fused_geglu(x_, w_, "gelu") ** 2)

    def loss_ref(x_, w_):
        return jnp.sum(_geglu_reference(x_, w_, "gelu") ** 2)

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, wi)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, wi)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r), atol=1e-4, rtol=1e-4)


def test_mlp_param_tree_is_path_independent(monkeypatch):
    """The fused and unfused MLP paths must produce identical param trees
    (checkpoints are interchangeable)."""
    from open_provence_tpu.configs import ModernBertBackboneConfig
    from open_provence_tpu.models.modernbert import ModernBertMLP

    cfg = ModernBertBackboneConfig(
        vocab_size=128, hidden_size=128, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=64, local_attention=8,
        pad_token_id=0, num_labels=1,
    )
    x = np.zeros((2, 64, 128), np.float32)
    mlp = ModernBertMLP(cfg)
    monkeypatch.setenv("OPEN_PROVENCE_TPU_FUSED_GEGLU", "0")
    tree_off = jax.tree.map(lambda v: v.shape, mlp.init(jax.random.PRNGKey(0), x))
    monkeypatch.setenv("OPEN_PROVENCE_TPU_FUSED_GEGLU", "1")
    tree_on = jax.tree.map(lambda v: v.shape, mlp.init(jax.random.PRNGKey(0), x))
    assert tree_off == tree_on
    assert tree_on == {
        "params": {"Wi": {"kernel": (128, 256)}, "Wo": {"kernel": (128, 128)}}
    }


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_ln_geglu_matches_reference(dtype):
    from open_provence_tpu.ops.geglu import _ln_geglu_reference, fused_ln_geglu

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(256, 128)), dtype=dtype)
    scale = jnp.asarray(1.0 + 0.1 * rng.normal(size=(128,)), dtype=dtype)
    wi = jnp.asarray(rng.normal(size=(128, 256)) * 0.05, dtype=dtype)
    with pltpu.force_tpu_interpret_mode():
        out = fused_ln_geglu(x, scale, wi, "gelu", 1e-5)
    ref = _ln_geglu_reference(x, scale, wi, "gelu", 1e-5)
    atol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=atol, rtol=atol
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_ln_matmul_matches_reference(dtype):
    from open_provence_tpu.ops.geglu import (
        _ln_matmul_reference,
        fused_ln_matmul,
        ln_matmul_supported,
    )

    assert ln_matmul_supported(16384, 768, 2304, 2)
    assert not ln_matmul_supported(100, 768, 2304, 2)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(256, 128)), dtype=dtype)
    scale = jnp.asarray(1.0 + 0.1 * rng.normal(size=(128,)), dtype=dtype)
    w = jnp.asarray(rng.normal(size=(128, 384)) * 0.05, dtype=dtype)
    with pltpu.force_tpu_interpret_mode():
        out = fused_ln_matmul(x, scale, w, 1e-5)
    ref = _ln_matmul_reference(x, scale, w, 1e-5)
    atol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=atol, rtol=atol
    )


def test_ln_fused_gradients_match_reference():
    from open_provence_tpu.ops.geglu import (
        _ln_geglu_reference,
        _ln_matmul_reference,
        fused_ln_geglu,
        fused_ln_matmul,
    )

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(128, 128)), dtype=jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.normal(size=(128,)), dtype=jnp.float32)
    wi = jnp.asarray(rng.normal(size=(128, 256)) * 0.05, dtype=jnp.float32)
    w = jnp.asarray(rng.normal(size=(128, 384)) * 0.05, dtype=jnp.float32)

    def loss_f(x_, s_, w_):
        return jnp.sum(fused_ln_geglu(x_, s_, w_, "gelu", 1e-5) ** 2)

    def loss_r(x_, s_, w_):
        return jnp.sum(_ln_geglu_reference(x_, s_, w_, "gelu", 1e-5) ** 2)

    # Context wraps the grad call: the fused BACKWARD is a pallas_call too.
    with pltpu.force_tpu_interpret_mode():
        gf_all = jax.grad(loss_f, argnums=(0, 1, 2))(x, scale, wi)
    for gf, gr in zip(
        gf_all,
        jax.grad(loss_r, argnums=(0, 1, 2))(x, scale, wi),
    ):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-4, rtol=1e-4)

    def loss_mf(x_, s_, w_):
        return jnp.sum(fused_ln_matmul(x_, s_, w_, 1e-5) ** 2)

    def loss_mr(x_, s_, w_):
        return jnp.sum(_ln_matmul_reference(x_, s_, w_, 1e-5) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gmf = jax.grad(loss_mf, argnums=(0, 1, 2))(x, scale, w)
    for gf, gr in zip(
        gmf,
        jax.grad(loss_mr, argnums=(0, 1, 2))(x, scale, w),
    ):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-4, rtol=1e-4)


def test_layer_param_tree_with_ln_fusion(monkeypatch):
    """Folding the norms into GEMM kernels must not change the checkpoint
    tree: attn_norm/mlp_norm keep their scale entries, Wqkv/Wi keep their
    kernel entries."""
    from open_provence_tpu.configs import ModernBertBackboneConfig
    import open_provence_tpu.models.modernbert as mb

    cfg = ModernBertBackboneConfig(
        vocab_size=128, hidden_size=128, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=256, local_attention=32,
        pad_token_id=0, num_labels=1,
    )
    layer = mb.ModernBertEncoderLayer(cfg, layer_id=1)
    x = jnp.zeros((2, 128, 128), jnp.float32)
    pm = jnp.ones((2, 128), jnp.int32)

    def tree(fused):
        if fused:
            monkeypatch.setattr(
                "open_provence_tpu.ops.attention._default_platform", lambda: "tpu"
            )
        else:
            monkeypatch.setattr(
                "open_provence_tpu.ops.attention._default_platform", lambda: "cpu"
            )
        from jax.experimental.pallas import tpu as pltpu_
        with pltpu_.force_tpu_interpret_mode():
            params = layer.init(jax.random.PRNGKey(0), x, pm, True, "xla")
        return jax.tree.map(lambda v: v.shape, params)

    t_fused = tree(True)
    t_plain = tree(False)
    assert t_fused == t_plain
    p = t_plain["params"]
    assert p["attn_norm"] == {"scale": (128,)}
    assert p["mlp_norm"] == {"scale": (128,)}
    assert p["attn"]["Wqkv"] == {"kernel": (128, 384)}
    assert p["mlp"]["Wi"] == {"kernel": (128, 256)}


def test_backbone_forward_with_ln_fusion_matches_plain(monkeypatch):
    """Full 2-layer backbone: the TPU fused-LN kernel composition must match
    the plain CPU path within fp32 kernel tolerance."""
    from open_provence_tpu.configs import ModernBertBackboneConfig
    import open_provence_tpu.models.modernbert as mb
    from jax.experimental.pallas import tpu as pltpu_

    cfg = ModernBertBackboneConfig(
        vocab_size=512, hidden_size=128, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=256, local_attention=32,
        pad_token_id=0, num_labels=1,
    )
    model = mb.ModernBertEncoder(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 512, (2, 128)), jnp.int32)
    pm = jnp.ones((2, 128), jnp.int32)

    def run(platform):
        monkeypatch.setattr(
            "open_provence_tpu.ops.attention._default_platform", lambda: platform
        )
        with pltpu_.force_tpu_interpret_mode():
            params = model.init(jax.random.PRNGKey(0), ids, pm,
                                attention_impl="xla")
            return model.apply(params, ids, pm, attention_impl="xla")

    out_fused = run("tpu")
    out_plain = run("cpu")
    assert "last_hidden_state" in out_plain and "last_hidden_pre_norm" in out_plain
    for key in ("last_hidden_state", "last_hidden_pre_norm"):
        np.testing.assert_allclose(
            np.asarray(out_fused[key]), np.asarray(out_plain[key]),
            atol=2e-4, rtol=2e-4,
        )


@pytest.mark.parametrize("act", ["gelu", "gelu_pytorch_tanh", "silu"])
def test_fused_backward_kernel_matches_reference(act, monkeypatch):
    """The one-pass Pallas backward (recompute + dx/dscale/dWi in VMEM)
    must match grads of the XLA reference composition."""
    from open_provence_tpu.ops.geglu import (
        _ln_geglu_reference,
        _pick_block_m_bwd,
        fused_ln_geglu,
    )

    assert _pick_block_m_bwd(16384, 768, 1152, 2) is not None
    monkeypatch.setenv("OPEN_PROVENCE_TPU_FUSED_GEGLU_BWD", "1")
    rng = np.random.default_rng(7)
    M, K, I = 256, 128, 128
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.normal(size=(K,)), jnp.float32)
    wi = jnp.asarray(rng.normal(size=(K, 2 * I)) * 0.05, jnp.float32)

    def loss_f(x_, s_, w_):
        return jnp.sum(fused_ln_geglu(x_, s_, w_, act, 1e-5) ** 2)

    def loss_r(x_, s_, w_):
        return jnp.sum(_ln_geglu_reference(x_, s_, w_, act, 1e-5) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_f, argnums=(0, 1, 2))(x, scale, wi)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, scale, wi)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )


@pytest.mark.parametrize("k,i", [(384, 576), (256, 328)])
def test_geglu_unaligned_intermediate(k, i):
    """ModernBERT-large (I=2624) and xsmall (I=576) have intermediate sizes
    that are 64- but not 128-lane aligned; Mosaic pads the lane dim.
    Exercise a scaled-down analog of each."""
    from open_provence_tpu.ops.geglu import geglu_supported

    assert geglu_supported(4096, 1024, 2624, 2)  # large
    assert geglu_supported(4096, 384, 576, 2)    # xsmall
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(256, k)), jnp.float32)
    wi = jnp.asarray(rng.normal(size=(k, 2 * i)) * 0.05, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = fused_geglu(x, wi, "gelu")
    ref = _geglu_reference(x, wi, "gelu")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_ln_geglu_wo_matches_reference(dtype):
    """Full-MLP fusion (LN → GeGLU → Wo in one kernel) forward parity."""
    from open_provence_tpu.ops.geglu import (
        _ln_geglu_wo_reference,
        fused_ln_geglu_wo,
        geglu_wo_supported,
    )

    assert geglu_wo_supported(16384, 768, 1152, 2)
    rng = np.random.default_rng(11)
    M, K, I = 256, 128, 192
    x = jnp.asarray(rng.normal(size=(M, K)), dtype=dtype)
    scale = jnp.asarray(1.0 + 0.1 * rng.normal(size=(K,)), dtype=dtype)
    wi = jnp.asarray(rng.normal(size=(K, 2 * I)) * 0.05, dtype=dtype)
    wo = jnp.asarray(rng.normal(size=(I, K)) * 0.05, dtype=dtype)
    with pltpu.force_tpu_interpret_mode():
        out = fused_ln_geglu_wo(x, scale, wi, wo, "gelu", 1e-5)
    ref = _ln_geglu_wo_reference(x, scale, wi, wo, "gelu", 1e-5)
    assert out.dtype == dtype
    atol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=atol, rtol=atol,
    )


@pytest.mark.parametrize("act", ["gelu", "silu"])
@pytest.mark.parametrize("pallas_bwd", [True, False])
def test_ln_geglu_wo_gradients_match_reference(act, pallas_bwd, monkeypatch):
    """Fused-tail backward (both the one-pass Pallas kernel and the XLA
    fallback) vs grads of the reference composition — all four inputs."""
    from open_provence_tpu.ops.geglu import (
        _ln_geglu_wo_reference,
        fused_ln_geglu_wo,
    )

    monkeypatch.setenv(
        "OPEN_PROVENCE_TPU_FUSED_GEGLU_BWD", "1" if pallas_bwd else "0"
    )
    rng = np.random.default_rng(12)
    M, K, I = 256, 128, 192
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.normal(size=(K,)), jnp.float32)
    wi = jnp.asarray(rng.normal(size=(K, 2 * I)) * 0.05, jnp.float32)
    wo = jnp.asarray(rng.normal(size=(I, K)) * 0.05, jnp.float32)

    def loss_f(x_, s_, wi_, wo_):
        return jnp.sum(fused_ln_geglu_wo(x_, s_, wi_, wo_, act, 1e-5) ** 2)

    def loss_r(x_, s_, wi_, wo_):
        return jnp.sum(_ln_geglu_wo_reference(x_, s_, wi_, wo_, act, 1e-5) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_f, argnums=(0, 1, 2, 3))(x, scale, wi, wo)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(x, scale, wi, wo)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )


def test_mlp_tail_param_tree_and_forward_match_split(monkeypatch):
    """OPEN_PROVENCE_TPU_FUSED_MLP_TAIL must not change the checkpoint tree
    (Wi/Wo keep their nn.Dense kernel leaves) and must match the split
    fused path's forward and gradients on the same params."""
    from open_provence_tpu.configs import ModernBertBackboneConfig
    import open_provence_tpu.models.modernbert as mb

    cfg = ModernBertBackboneConfig(
        vocab_size=128, hidden_size=128, intermediate_size=192,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=256, local_attention=32,
        pad_token_id=0, num_labels=1,
    )
    monkeypatch.setattr(
        "open_provence_tpu.ops.attention._default_platform", lambda: "tpu"
    )
    layer = mb.ModernBertEncoderLayer(cfg, layer_id=1)
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 128, 128)), jnp.float32
    )
    pm = jnp.ones((2, 128), jnp.int32)

    def init_and_run(tail):
        monkeypatch.setenv(
            "OPEN_PROVENCE_TPU_FUSED_MLP_TAIL", "1" if tail else "0"
        )
        with pltpu.force_tpu_interpret_mode():
            params = layer.init(jax.random.PRNGKey(0), x, pm, True, "xla")
            out = layer.apply(params, x, pm, True, "xla")

            def loss(p):
                return jnp.sum(layer.apply(p, x, pm, True, "xla") ** 2)

            grads = jax.grad(loss)(params)
        return params, out, grads

    p_tail, out_tail, g_tail = init_and_run(True)
    p_split, out_split, g_split = init_and_run(False)
    assert jax.tree.map(lambda v: v.shape, p_tail) == jax.tree.map(
        lambda v: v.shape, p_split
    )
    np.testing.assert_allclose(
        np.asarray(out_tail), np.asarray(out_split), atol=2e-4, rtol=2e-4
    )
    for a, b in zip(jax.tree.leaves(g_tail), jax.tree.leaves(g_split)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3
        )
