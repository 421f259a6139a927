import numpy as np
import jax
import jax.numpy as jnp
import pytest

from amos_slam_tpu.models.yolact import Yolact, make_priors, PROTO_DIM
from amos_slam_tpu.models.train import GTBatch, make_train_step, multibox_loss


def tiny_setup():
    model = Yolact(num_classes=4, backbone_layers=(1, 1, 1, 1))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    # priors for a 128x128 input: reuse generator logic scaled down
    import amos_slam_tpu.models.yolact as Y
    old = (Y.SCALES,)
    priors = jnp.asarray(make_priors(128))
    return model, params, priors


def make_batch(rng, B=2, G=3, S=128, Hp=32, Wp=32):
    images = jnp.asarray(rng.normal(0, 1, (B, S, S, 3)).astype(np.float32))
    boxes = np.zeros((B, G, 4), np.float32)
    labels = np.full((B, G), -1, np.int32)
    masks = np.zeros((B, G, Hp, Wp), np.float32)
    for b in range(B):
        for g in range(2):  # 2 real boxes, 1 padding
            x1, y1 = rng.uniform(0.1, 0.5, 2)
            w, h = rng.uniform(0.2, 0.4, 2)
            boxes[b, g] = [x1, y1, min(x1 + w, 0.95), min(y1 + h, 0.95)]
            labels[b, g] = rng.integers(0, 3)
            xs = slice(int(x1 * Wp), int((x1 + w) * Wp))
            ys = slice(int(y1 * Hp), int((y1 + h) * Hp))
            masks[b, g, ys, xs] = 1.0
    return GTBatch(
        images=images,
        boxes=jnp.asarray(boxes),
        labels=jnp.asarray(labels),
        masks=jnp.asarray(masks),
    )


def test_loss_finite_and_components(rng):
    model, params, priors = tiny_setup()
    batch = make_batch(rng)
    loss, aux = multibox_loss(model, params, priors, batch)
    assert np.isfinite(float(loss))
    for k in ("loc", "conf", "mask"):
        assert np.isfinite(float(aux[k])) and float(aux[k]) >= 0


def test_train_step_decreases_loss(rng):
    model, params, priors = tiny_setup()
    batch = make_batch(rng)
    init, step = make_train_step(model, priors, lr=1e-3)
    state = init(params)
    step = jax.jit(step)
    losses = []
    for _ in range(12):
        state, loss, aux = step(state, batch)
        losses.append(float(loss))
    assert np.mean(losses[-4:]) < 0.9 * np.mean(losses[:4]), losses


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_train_step_data_parallel(rng):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    model, params, priors = tiny_setup()
    batch = make_batch(rng, B=8)
    init, step = make_train_step(model, priors)
    state = init(params)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("dp",))
    data = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())
    sharded = jax.jit(step, in_shardings=(repl, data), out_shardings=None)
    batch = jax.device_put(batch, data)
    state = jax.device_put(state, repl)
    state2, loss, aux = sharded(state, batch)
    assert np.isfinite(float(loss))
    # gradients were all-reduced: params remain replicated
    assert int(state2.step) == 1
