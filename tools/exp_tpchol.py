"""Chip experiment: distributed_cholesky (cyclic unrolled) vs XLA cholesky
at n=4096, D=1, several block sizes."""
import sys, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from jax.sharding import Mesh
    sys.path.insert(0, "/root/repo")
    from bundle_adjustment_tpu.parallel import tp
    sys.path.insert(0, "/root/repo/tools")
    import tputime

    n = 4096
    rng = np.random.default_rng(0)
    A = rng.standard_normal((n, n)).astype(np.float32)
    S = jnp.asarray(A @ A.T + n * np.eye(n, dtype=np.float32))
    flops = n**3 / 3
    mesh = Mesh(np.array(jax.devices()[:1]), (tp.AXIS,))

    xla = jax.jit(jnp.linalg.cholesky)
    dt = tputime.timeit_slope(lambda k: xla(S + 1e-6 * k), r1=2, r2=8)
    print(f"xla: {flops/dt/1e9:.0f} GFLOP/s", flush=True)
    for blk in (256, 512, 1024):
        f = jax.jit(lambda S_: tp.distributed_cholesky(S_, mesh, block=blk))
        try:
            dt = tputime.timeit_slope(lambda k: f(S + 1e-6 * k), r1=2, r2=8)
            print(f"tp cyclic block={blk}: {flops/dt/1e9:.0f} GFLOP/s",
                  flush=True)
        except Exception as e:
            print(f"block={blk}: {str(e)[:160]}", flush=True)

if __name__ == "__main__":
    main()
