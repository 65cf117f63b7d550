import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from vse_tpu.models.crnn import CRNNRecognizer
from vse_tpu.models.db_detector import DBDetector


@pytest.fixture(scope="module")
def rngkey():
    return jax.random.PRNGKey(0)


def test_db_detector_mobile_shapes(rngkey):
    model = DBDetector(variant="mobile")
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    params = model.init(rngkey, x)
    prob = model.apply(params, x)
    assert prob.shape == (1, 64, 96)
    assert prob.dtype == jnp.float32
    p = np.array(prob)
    assert (p >= 0).all() and (p <= 1).all()


def test_db_detector_train_outputs(rngkey):
    model = DBDetector(variant="mobile", train_outputs=True)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(rngkey, x, train=True)
    (prob, thresh, binary), _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert prob.shape == thresh.shape == binary.shape == (1, 32, 32)


def test_crnn_mobile_shapes(rngkey):
    model = CRNNRecognizer(vocab_size=97, variant="mobile")
    x = jnp.zeros((2, 48, 160, 3), jnp.float32)
    params = model.init(rngkey, x)
    logits = model.apply(params, x)
    # W/4 sequence steps, vocab+1 classes
    assert logits.shape == (2, 40, 98)
    assert logits.dtype == jnp.float32


def test_crnn_jit_compiles(rngkey):
    model = CRNNRecognizer(vocab_size=10, variant="mobile")
    x = jnp.zeros((1, 48, 64, 3), jnp.float32)
    params = model.init(rngkey, x)
    fn = jax.jit(lambda p, x: model.apply(p, x))
    out = fn(params, x)
    assert out.shape == (1, 16, 11)
