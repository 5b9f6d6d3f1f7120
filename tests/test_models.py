"""Shape/contract tests for every model in the registry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet_like_pose_estimation_tpu.models import (
    MODEL_REGISTRY,
    get_model_spec,
    losses,
)

B, N, C = 4, 128, 7
KEY = jax.random.key(0)


def _inputs(kind):
    k1, k2 = jax.random.split(KEY)
    if kind == "xyz":
        return (jax.random.normal(k1, (B, N, 3)),)
    spliced = jnp.concatenate(
        [jax.random.normal(k1, (B, N, 3)), jnp.zeros((B, N, C)).at[:, :, 1].set(1.0)],
        axis=-1,
    )
    if kind == "spliced":
        return (spliced,)
    return (spliced, jax.random.normal(k2, (B, 3)))


def _init_and_apply(spec, train=False):
    model = spec.make(num_classes=C) if spec.task == "classify" else spec.make()
    args = _inputs(spec.input_kind)
    variables = model.init({"params": KEY, "dropout": KEY}, *args, train=True)
    out = model.apply(
        variables,
        *args,
        train=train,
        rngs={"dropout": KEY} if train else None,
        mutable=["batch_stats"] if train else False,
    )
    if train:
        out = out[0]
    return out


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_forward_shapes(name):
    spec = get_model_spec(name)
    out = _init_and_apply(spec)
    if spec.task == "classify":
        log_probs, aux, choice = out
        assert log_probs.shape == (B, C)
        assert choice.shape == (B,)
        np.testing.assert_allclose(
            np.exp(np.asarray(log_probs)).sum(-1), 1.0, rtol=1e-4
        )
    elif spec.task == "sign":
        prob, sign = out
        assert prob.shape == (B, 1) and sign.shape == (B, 1)
        p = np.asarray(prob)
        assert (p > 0).all() and (p < 1).all()
        assert set(np.asarray(sign).ravel().tolist()) <= {-1.0, 0.0, 1.0}
    elif spec.task in ("rotation", "translation"):
        assert out.shape == (B, 3)
    else:  # width
        assert out.shape == (B, 1)


@pytest.mark.parametrize("name", ["pointnet_cls", "rotation", "sign", "translation"])
def test_train_mode_runs(name):
    spec = get_model_spec(name)
    out = _init_and_apply(spec, train=True)
    leaves = jax.tree_util.tree_leaves(out)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_loss_finite(name):
    spec = get_model_spec(name)
    out = _init_and_apply(spec)
    if spec.task == "classify":
        target = jnp.arange(B) % C
    elif spec.task == "sign":
        target = jnp.asarray([1.0, -1.0, 1.0, -1.0])
    elif spec.task == "width":
        target = jax.random.normal(KEY, (B, 1))
    else:
        target = jax.random.normal(KEY, (B, 3))
    loss = spec.loss(out, target)
    metric = spec.metric(out, target)
    assert np.isfinite(float(loss)) and np.isfinite(float(metric))


def test_tnet_identity_at_init():
    # transforms start at exact identity (our zeros+I init)
    from pointnet_like_pose_estimation_tpu.nn import TNet

    x = jax.random.normal(KEY, (2, 64, 3))
    tnet = TNet(k=3)
    variables = tnet.init(KEY, x, train=True)
    t = tnet.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(t), np.eye(3)[None].repeat(2, 0), atol=1e-5)


def test_orthogonality_regularizer_zero_for_identity():
    t = jnp.eye(4)[None].repeat(3, axis=0)
    assert float(losses.orthogonality_regularizer(t)) < 1e-4


def test_loss_functions_reference_semantics():
    lp = jnp.log(jnp.asarray([[0.7, 0.2, 0.1], [0.1, 0.8, 0.1]]))
    labels = jnp.asarray([0, 1])
    want = -(np.log(0.7) + np.log(0.8)) / 2
    np.testing.assert_allclose(float(losses.nll_loss(lp, labels)), want, rtol=1e-5)

    pred = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    targ = jnp.zeros((2, 2))
    np.testing.assert_allclose(
        float(losses.regression_loss(pred, targ, "L2_loss", "mean")), 7.5
    )
    np.testing.assert_allclose(
        float(losses.regression_loss(pred, targ, "L1_loss", "sum")), 10.0
    )

    prob = jnp.asarray([[0.9], [0.2]])
    sign = jnp.asarray([1.0, -1.0])
    want = -(np.log(0.9) + np.log(0.8)) / 2
    np.testing.assert_allclose(float(losses.sign_loss(prob, sign)), want, rtol=1e-5)


def test_batch_norm_runs_float32_under_bf16():
    """bf16 BatchNorm breaks training (round-5 bisection, docs/PERF.md):
    batch_norm_f32 must return float32 activations for bfloat16 inputs so
    the normalize/affine arithmetic keeps the mantissa, while Dense layers
    stay bf16 (checked via the dtype entering the SECOND dense layer)."""
    import flax.linen as nn

    from pointnet_like_pose_estimation_tpu.nn import PointwiseMLP, batch_norm_f32

    class Probe(nn.Module):
        @nn.compact
        def __call__(self, x, *, train: bool):
            return batch_norm_f32(x, train=train, name="bn")

    x = jnp.ones((4, 16, 8), jnp.bfloat16)
    probe = Probe()
    v = probe.init(jax.random.PRNGKey(0), x, train=True)
    y = probe.apply(v, x, train=False)
    assert y.dtype == jnp.float32
    # param tree unchanged vs the pre-fix layout (checkpoint compatibility)
    mlp = PointwiseMLP([8, 8], dtype=jnp.bfloat16)
    vm = mlp.init(jax.random.PRNGKey(0), x, train=True)
    assert sorted(vm["params"].keys()) == ["bn_0", "bn_1", "dense_0", "dense_1"]
    # BN scale/bias live in f32
    assert vm["params"]["bn_0"]["scale"].dtype == jnp.float32
