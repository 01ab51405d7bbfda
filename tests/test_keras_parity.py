"""Heatmap parity: JAX model vs independent Keras/TF oracle ≤1e-5
(BASELINE.json north_star; SURVEY.md §4.1)."""

import numpy as np
import pytest

from ubdvss_tpu import NetConfig, get_model, init_params

keras_model = pytest.importorskip("oracle.keras_model")


@pytest.mark.parametrize(
    "cfg",
    [
        NetConfig(),
        NetConfig(separable_context=False, dilations=(1, 2, 4)),
        NetConfig(classification=False),
    ],
    ids=["default", "nonseparable", "det-only"],
)
def test_heatmap_parity(cfg):
    params = init_params(cfg, 3)
    rng = np.random.default_rng(0)
    # odd spatial dims exercise SAME-padding parity for the strided convs
    for hw in [(64, 64), (60, 92)]:
        x = rng.uniform(-1, 1, (2, *hw, 1)).astype(np.float32)
        ours = np.asarray(get_model(cfg).apply({"params": params}, x))
        km = keras_model.build_keras_model(cfg, hw)
        keras_model.copy_flax_params_to_keras(params, km, cfg)
        theirs = np.asarray(km(x))
        assert ours.shape == theirs.shape
        assert np.max(np.abs(ours - theirs)) <= 1e-5, np.max(np.abs(ours - theirs))


def test_loss_parity_on_logits():
    """Mined detection BCE + masked classification CE: VALUE and GRADIENT
    parity vs the TF oracle on raw logits (VERDICT r2 item 5 — training
    loss is where reference-behavior drift would hide)."""
    import jax
    import jax.numpy as jnp
    import tensorflow as tf

    from oracle.losses_tf import tf_total_loss
    from ubdvss_tpu.losses import total_loss

    cfg = NetConfig(class_names=("A", "B", "C"), hard_negative_ratio=3)
    rng = np.random.default_rng(7)
    for b, h, w in [(2, 8, 8), (3, 16, 12)]:
        logits = rng.normal(size=(b, h, w, 4)).astype(np.float32)
        segmap = rng.integers(0, 4, size=(b, h, w)).astype(np.int32)
        # one all-background image exercises the k = ratio floor
        segmap[0] = 0

        jloss, jgrad = jax.value_and_grad(
            lambda lg: total_loss(lg, jnp.asarray(segmap), cfg)[0]
        )(jnp.asarray(logits))
        jloss, jgrad = float(jloss), np.asarray(jgrad)

        lt = tf.constant(logits)
        with tf.GradientTape() as tape:
            tape.watch(lt)
            tloss, _ = tf_total_loss(lt, tf.constant(segmap), cfg)
        tgrad = tape.gradient(tloss, lt).numpy()

        assert abs(jloss - float(tloss)) <= 1e-5, (jloss, float(tloss))
        assert np.max(np.abs(jgrad - tgrad)) <= 1e-6, np.max(np.abs(jgrad - tgrad))


def test_loss_and_input_gradient_parity_end_to_end():
    """model forward + mined loss vs keras oracle + TF loss: loss equality
    and input-gradient agreement (f32, HIGHEST) on a small batch."""
    import jax
    import jax.numpy as jnp
    import tensorflow as tf

    from oracle.losses_tf import tf_total_loss
    from ubdvss_tpu.losses import total_loss

    cfg = NetConfig()
    params = init_params(cfg, 9)
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32)
    segmap = rng.integers(0, cfg.n_classes + 1, size=(2, 8, 8)).astype(np.int32)

    def jax_loss(xx):
        logits = get_model(cfg).apply({"params": params}, xx)
        return total_loss(logits, jnp.asarray(segmap), cfg)[0]

    jloss, jgrad = jax.value_and_grad(jax_loss)(jnp.asarray(x))

    km = keras_model.build_keras_model(cfg, (32, 32))
    keras_model.copy_flax_params_to_keras(params, km, cfg)
    xt = tf.constant(x)
    with tf.GradientTape() as tape:
        tape.watch(xt)
        tloss, _ = tf_total_loss(km(xt), tf.constant(segmap), cfg)
    tgrad = tape.gradient(tloss, xt).numpy()

    assert abs(float(jloss) - float(tloss)) <= 1e-5
    assert np.max(np.abs(np.asarray(jgrad) - tgrad)) <= 2e-5
