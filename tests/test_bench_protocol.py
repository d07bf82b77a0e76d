"""Pin the bench steady-state sampling chain's key semantics.

The chained-dispatch sampling protocol (bench.measure_sampling) relies on
`_chain_key` giving every dispatch a distinct key while making each key
data-dependent on the previous dispatch's output WITHOUT changing the key's
value (the dependence rides a `0 * prev` term). If the value ever leaked
into the key, the steady-state run would sample a different trajectory set
than the per-dispatch protocol; if keys collided, reps would re-run
identical work and overstate throughput stability.
"""
import jax
import jax.numpy as jnp

import bench


def test_chain_keys_distinct_per_step():
    base = jax.random.PRNGKey(0)
    ks = [bench._chain_key(base, i, jnp.float32(0)) for i in range(4)]
    for i in range(4):
        for j in range(i + 1, 4):
            assert not bool(jnp.all(ks[i] == ks[j]))


def test_chain_key_value_independent_of_prev_output():
    # the prev term only creates the device-side dependence edge; the key
    # VALUE must be a function of (base, i) alone
    base = jax.random.PRNGKey(7)
    k_a = bench._chain_key(base, 2, jnp.float32(-1234.5))
    k_b = bench._chain_key(base, 2, jnp.float32(0.25))
    assert bool(jnp.all(k_a == k_b))


def test_chain_key_matches_plain_fold_in():
    # per-dispatch and steady-state protocols must be comparable: chained
    # key i equals fold_in(base, i)
    base = jax.random.PRNGKey(3)
    k = bench._chain_key(base, 5, jnp.float32(0))
    assert bool(jnp.all(k == jax.random.fold_in(base, 5)))


def test_chain_key_nan_safe():
    # a NaN/Inf from a previous dispatch must not perturb the chained key
    # (ADVICE r4: float->uint32 of NaN is implementation-defined on TPU)
    base = jax.random.PRNGKey(3)
    for bad in (float("nan"), float("inf"), -float("inf")):
        k = bench._chain_key(base, 5, jnp.float32(bad))
        assert bool(jnp.all(k == jax.random.fold_in(base, 5)))


def test_zero_like_preserves_value_and_dtype():
    # the float-tensor chaining edge (FNO/OFormer steady-state inference)
    # must be value- and dtype-neutral, including after NaN/Inf outputs
    x = jnp.full((3,), 2.5, jnp.bfloat16)
    for bad in (0.0, float("nan"), float("inf")):
        z = bench._zero_like(x, jnp.float32(bad))
        assert z.dtype == x.dtype
        assert bool(jnp.all(z == x))
