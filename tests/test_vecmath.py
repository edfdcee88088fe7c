import numpy as np
import jax.numpy as jnp

from wasm_pathtracer_tpu.utils import vecmath as vm


def test_orthogonal_is_orthogonal_unit():
    rng = np.random.default_rng(0)
    v = vm.normalize(jnp.asarray(rng.normal(size=(256, 3)), jnp.float32))
    o = vm.orthogonal(v)
    assert np.allclose(np.asarray(vm.dot(v, o)), 0.0, atol=1e-5)
    assert np.allclose(np.asarray(vm.length(o)), 1.0, atol=1e-5)


def test_orthogonal_axis_cases():
    for axis in np.eye(3, dtype=np.float32):
        o = np.asarray(vm.orthogonal(jnp.asarray(axis)))
        assert abs(float(np.dot(o, axis))) < 1e-6


def test_rot_roundtrip():
    v = jnp.asarray([[0.3, -0.2, 0.9]], jnp.float32)
    assert np.allclose(np.asarray(vm.rot_x(vm.rot_x(v, 0.7), -0.7)), np.asarray(v), atol=1e-6)
    assert np.allclose(np.asarray(vm.rot_y(vm.rot_y(v, 0.7), -0.7)), np.asarray(v), atol=1e-6)


def test_rot_matches_reference_matrices():
    # rot_x: [1 0 0; 0 c -s; 0 s c], rot_y: [c 0 s; 0 1 0; -s 0 c]
    # (``src/math/vec3.rs:95-119``)
    v = np.array([1.0, 2.0, 3.0], np.float32)
    a = 0.5
    c, s = np.cos(a), np.sin(a)
    want_x = np.array([v[0], c * v[1] - s * v[2], s * v[1] + c * v[2]])
    want_y = np.array([c * v[0] + s * v[2], v[1], -s * v[0] + c * v[2]])
    assert np.allclose(np.asarray(vm.rot_x(jnp.asarray(v), a)), want_x, atol=1e-6)
    assert np.allclose(np.asarray(vm.rot_y(jnp.asarray(v), a)), want_y, atol=1e-6)


def test_reflect():
    # reference convention reflects the *outgoing* vector: 2(v.n)n - v
    v = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    n = vm.normalize(jnp.asarray([[1.0, 1.0, 0.0]], jnp.float32))
    r = np.asarray(vm.reflect(v, n))[0]
    assert np.allclose(r, [1.0, 0.0, 0.0], atol=1e-6)
