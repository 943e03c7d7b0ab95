"""delta-E harness, profiling helpers, reinit, pos/neg evaluation, meters."""

import jax
import jax.numpy as jnp
import numpy as np

from stainlib_tpu.models.dann import init_dann, reinit_layers
from stainlib_tpu.models.evaluation import evaluate_pos_neg
from stainlib_tpu.ops.delta_e import delta_e76, delta_e_report, mean_delta_e
from stainlib_tpu.utils.meters import RunningAverageMeter, Throughput
from stainlib_tpu.utils.profiling import StepTimer
from tests.synth import he_patch


def test_delta_e_zero_for_identical():
    img = jnp.asarray(he_patch(16, 16, seed=0))
    assert float(mean_delta_e(img, img)) == 0.0


def test_delta_e_report_orders():
    a = jnp.asarray(he_patch(16, 16, seed=1))
    b = jnp.clip(a.astype(jnp.int32) + 3, 0, 255).astype(jnp.uint8)
    mean, p95, mx = delta_e_report(a, b)
    assert 0 < float(mean) <= float(p95) <= float(mx)
    assert float(mx) < 10.0  # +3 RGB steps is a small delta-E


def test_reinit_layers_changes_only_named():
    _, state, _ = init_dann(jax.random.PRNGKey(0), n_domains=3)
    new = reinit_layers(state.params, ["dom_regressor"], jax.random.PRNGKey(1))
    assert not np.allclose(
        np.asarray(new["dom_regressor"]["kernel"]),
        np.asarray(state.params["dom_regressor"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(new["mit_pred"]["kernel"]),
        np.asarray(state.params["mit_pred"]["kernel"]),
    )
    assert (np.asarray(new["dom_regressor"]["bias"]) == 0).all()


def test_evaluate_pos_neg():
    rng = np.random.default_rng(0)
    pos = rng.random((40, 4, 4, 3)).astype(np.float32) * 0.4 + 0.6
    neg = rng.random((40, 4, 4, 3)).astype(np.float32) * 0.4

    def predict(x):
        s = np.asarray(x).mean(axis=(1, 2, 3))
        return np.stack([1 - s, s], -1)

    auc, f1, fpr = evaluate_pos_neg(predict, pos, neg, threshold=0.5,
                                    batch_size=16)
    assert auc > 0.99 and f1 > 0.9 and fpr < 0.1


def test_meters():
    m = RunningAverageMeter(0.5)
    m.update(1.0)
    m.update(3.0)
    assert m.val == 3.0 and abs(m.avg - 2.0) < 1e-9
    t = Throughput()
    assert t.tick(10) > 0


def test_step_timer():
    timer = StepTimer()
    for _ in range(3):
        with timer.measure() as out:
            out["result"] = jnp.ones((8,)) * 2
    assert timer.p50() is not None and timer.p50() >= 0
