"""One-off TPU microprofile: attribute V-cycle time to legs.

Times (on the real chip) the fused pre-smooth super kernel, the column
transfer as dense MXU matmul vs strided-slice banded form, the up-leg
kernel, and the full cycle, at the bench size (max_level=12, 4097^2).

Run alone (single-client TPU tunnel): python scripts/tpu_profile_legs.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time

import numpy as np


def timeit(fn, *args, reps=10):
    # NOTE: block_until_ready does not synchronize through the axon relay
    # (enqueue-ack only); a scalar host fetch is the only reliable barrier.
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("device:", jax.devices()[0], file=sys.stderr)

    n = 2**12 + 1
    m = n
    nc = (n - 1) // 2
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (n, m), jnp.float32)
    b = jax.random.normal(key, (n, m), jnp.float32)
    e = jax.random.normal(key, (nc, nc), jnp.float32)
    rr = jax.random.normal(key, (nc, m), jnp.float32)

    from evostencils_tpu.ops.pallas import transfer as pt
    from evostencils_tpu.ops import apply as ops

    vals = (4.0, -1.0, -1.0, -1.0, -1.0)
    taps = (0.25, 0.5, 0.25)

    # K-rep wrapper to amortize ~25ms RPC latency
    K = 200

    def krep(f):
        def g(*a):
            def body(c, _):
                return f(*a, c), None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
            return out
        return jax.jit(g)

    # 1. super kernel: pre-smooth x2 + residual + row restrict
    def leg_super(u, b, c):
        us, r = pt.presmooth_residual_rowrestrict(
            u + c, b, [jnp.float32(1.15), jnp.float32(1.15)], vals, taps)
        return us[0, 0] + r[0, 0]
    t = timeit(krep(leg_super), u, b) / K
    print(f"super presmooth+rr:      {t*1e3:8.3f} ms")

    # 2a. column restrict as dense matmul
    Mcol = jnp.asarray(ops._restriction_axis_matrix(list(taps), 1, m, nc),
                       jnp.float32)

    def leg_mm(rr, c):
        return ((rr + c) @ Mcol.T)[0, 0]
    t = timeit(krep(leg_mm), rr) / K
    print(f"col-restrict matmul:     {t*1e3:8.3f} ms")

    # 2b. column restrict as strided slices
    def leg_strided(rr, c):
        r2 = rr + c
        ev = r2[:, 0::2]          # (nc, nc+1)
        od = r2[:, 1::2]          # (nc, nc)
        out = taps[0] * ev[:, :-1] + taps[1] * od + taps[2] * ev[:, 1:]
        return out[0, 0]
    t = timeit(krep(leg_strided), rr) / K
    print(f"col-restrict strided:    {t*1e3:8.3f} ms")

    # 2c. column restrict via reshape-pair
    def leg_reshape(rr, c):
        r2 = rr + c
        body = r2[:, 1:].reshape(nc, nc, 2)   # pairs (2j+1, 2j+2)
        od = body[:, :, 0]
        ev_next = body[:, :, 1]
        ev = jnp.concatenate([r2[:, 0:1], ev_next[:, :-1]], axis=1)
        out = taps[0] * ev + taps[1] * od + taps[2] * ev_next
        return out[0, 0]
    t = timeit(krep(leg_reshape), rr) / K
    print(f"col-restrict reshape:    {t*1e3:8.3f} ms")

    # 3a. column prolong as dense matmul
    Pm = jnp.asarray(ops._prolongation_axis_matrix(list(taps), 1, m, nc),
                     jnp.float32)

    def leg_pm(e, c):
        return ((e + c) @ Pm.T)[0, 0]
    t = timeit(krep(leg_pm), e) / K
    print(f"col-prolong matmul:      {t*1e3:8.3f} ms")

    # 3b. column prolong via interleave
    def leg_pil(e, c):
        e2 = e + c
        evn = taps[2] * jnp.concatenate(
            [jnp.zeros((nc, 1), e2.dtype), e2[:, :-1]], axis=1) \
            + taps[0] * e2
        odd = taps[1] * e2
        inter = jnp.stack([evn, odd], axis=-1).reshape(nc, 2 * nc)
        out = jnp.concatenate(
            [inter, taps[2] * e2[:, -1:]], axis=1)
        return out[0, 0]
    t = timeit(krep(leg_pil), e) / K
    print(f"col-prolong interleave:  {t*1e3:8.3f} ms")

    # 4. up-leg kernel
    c_half = jax.random.normal(key, (nc, m), jnp.float32)

    def leg_up(u, c_half, b, c):
        out = pt.prolong_correct_postsmooth(
            u + c, c_half, b, [jnp.float32(1.0), jnp.float32(1.15)],
            vals, taps)
        return out[0, 0]
    t = timeit(krep(leg_up), u, c_half, b) / K
    print(f"up-leg kernel:           {t*1e3:8.3f} ms")

    # 5. pure HBM copy for scale
    def leg_copy(u, c):
        return (u + c)[0, 0]
    t = timeit(krep(leg_copy), u) / K
    bw = 2 * u.size * 4 / t / 1e9
    print(f"read+write u:            {t*1e3:8.3f} ms  ({bw:.0f} GB/s)")

    # 6. full bench cycle for reference
    from evostencils_tpu.problems.poisson import poisson_2d
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.compiler.lower import lower_cycle
    from evostencils_tpu.ir import partitioning as part
    problem = poisson_2d(max_level=12, min_level=5)
    problem.dtype = np.float32
    cyc = v_cycle(problem.level_contexts, problem.rhs_entity,
                  pre_smoothing=2, post_smoothing=1, omega=1.15,
                  partitioning=part.RedBlack,
                  coarse_operator=problem.coarsest_operator)
    low = lower_cycle(cyc, problem.approximation, problem.rhs_entity)
    bb = problem.build_rhs()
    u0 = tuple(jnp.zeros_like(x) for x in bb)
    om = jnp.asarray(low.default_omegas, jnp.float32)

    def full(u0, bb, om, c):
        out = low.step(tuple(x + c for x in u0), bb, om)
        return out[0][0, 0]
    t = timeit(krep(full), u0, bb, om) / K
    print(f"full V(2,1) cycle:       {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
