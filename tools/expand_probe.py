"""Microbench: binning expansion variants (pair key/tri construction).

The profiler shows the current expansion costs ~2.8 ms/frame @400k pairs:
row gather of the (P,5) side table 0.53 + a slice fusion that XLA lowers
with 1-D T(1024) layouts at 1.36 ms + scatter-max 0.88. Variants here
restructure the table to 4 columns (off, rw, K0, A) with
key = K0[t] + (within << dbits) + q * A[t], and compare column-extraction
strategies. Timing per the PERF.md rule: repeats inside one jit with a data
dependence + scalar readback.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from triangle_splatting_tpu.utils.jax_setup import setup
    setup()
    from triangle_splatting_tpu.ops.binning import cummax

    P, MP = 100_000, 400_128
    grid_w = grid_h = 25
    num_tiles = 625
    dbits = 20
    key0 = jax.random.PRNGKey(0)
    ks = jax.random.split(key0, 8)
    rw = jax.random.randint(ks[0], (P,), 1, 6)
    rh = jax.random.randint(ks[1], (P,), 1, 6)
    rminx = jax.random.randint(ks[2], (P,), 0, grid_w - 5)
    rminy = jax.random.randint(ks[3], (P,), 0, grid_h - 5)
    depth_q = jax.random.randint(ks[4], (P,), 0, 1 << dbits)
    counts = (rw * rh).astype(jnp.int32)
    offsets = jnp.cumsum(counts) - counts
    num_pairs = jnp.minimum(offsets[-1] + counts[-1], MP).astype(jnp.int32)

    pair_idx = jnp.arange(MP, dtype=jnp.int32)

    def expand_common():
        has = counts > 0
        sc = jnp.where(has, offsets, MP)
        markers = jnp.zeros((MP,), jnp.int32).at[sc].max(
            jnp.where(has, jnp.arange(P, dtype=jnp.int32) + 1, 0),
            mode="drop")
        tri = cummax(markers) - 1
        valid = (pair_idx < num_pairs) & (tri >= 0)
        return jnp.clip(tri, 0, P - 1), valid

    def c2(x):
        return x.reshape(-1, 128)

    def v0():
        """Current binning.py structure: (P,5) row gather + column slices."""
        tri_safe, valid = expand_common()
        tbl = jnp.stack([offsets, rminx, rminy, rw, depth_q], axis=1)
        row = tbl[tri_safe]
        within = c2(pair_idx) - c2(row[:, 0])
        rwp = c2(row[:, 3])
        q = jnp.floor((within.astype(jnp.float32) + 0.5)
                      / rwp.astype(jnp.float32)).astype(jnp.int32)
        tile_x = c2(row[:, 1]) + within - q * rwp
        tile_y = c2(row[:, 2]) + q
        valid2 = c2(valid)
        tile_id = jnp.where(valid2, tile_y * grid_w + tile_x, num_tiles)
        key = ((tile_id << dbits) | jnp.where(valid2, c2(row[:, 4]), 0))
        return key.reshape(-1), tri_safe

    def k0a():
        base = rminy * grid_w + rminx
        K0 = (base << dbits) | depth_q
        A = (grid_w - rw) << dbits
        return K0, A

    def v1():
        """(MP,4) row gather -> transpose -> 2-D row arithmetic."""
        tri_safe, valid = expand_common()
        K0, A = k0a()
        tbl = jnp.stack([offsets, rw, K0, A], axis=1)
        row = tbl[tri_safe].T                         # (4, MP)
        within = c2(pair_idx) - c2(row[0])
        rwp = c2(row[1])
        q = jnp.floor((within.astype(jnp.float32) + 0.5)
                      / rwp.astype(jnp.float32)).astype(jnp.int32)
        key = c2(row[2]) + (within << dbits) + q * c2(row[3])
        key = jnp.where(c2(valid), key, num_tiles << dbits)
        return key.reshape(-1), tri_safe

    def v2():
        """(4, P) table, trailing-dim gather."""
        tri_safe, valid = expand_common()
        K0, A = k0a()
        tbl = jnp.stack([offsets, rw, K0, A], axis=0)  # (4, P)
        row = tbl[:, tri_safe]                         # (4, MP)
        within = c2(pair_idx) - c2(row[0])
        rwp = c2(row[1])
        q = jnp.floor((within.astype(jnp.float32) + 0.5)
                      / rwp.astype(jnp.float32)).astype(jnp.int32)
        key = c2(row[2]) + (within << dbits) + q * c2(row[3])
        key = jnp.where(c2(valid), key, num_tiles << dbits)
        return key.reshape(-1), tri_safe

    def v3():
        """Four 1-D gathers (known-bad control for the gather pricing)."""
        tri_safe, valid = expand_common()
        K0, A = k0a()
        within = c2(pair_idx) - c2(offsets[tri_safe])
        q = jnp.floor((within.astype(jnp.float32) + 0.5)
                      / c2(rw[tri_safe]).astype(jnp.float32)).astype(jnp.int32)
        key = c2(K0[tri_safe]) + (within << dbits) + q * c2(A[tri_safe])
        key = jnp.where(c2(valid), key, num_tiles << dbits)
        return key.reshape(-1), tri_safe

    variants = {"v0_current": v0, "v1_rowT": v1, "v2_colgather": v2,
                "v3_1d": v3}

    ref_key, ref_tri = jax.jit(v0)()
    for name, fn in variants.items():
        k, t = jax.jit(fn)()
        ok = bool(jnp.all(k == ref_key)) and bool(jnp.all(t == ref_tri))
        print(f"{name}: match={ok}", flush=True)

        def loop(n, fn=fn):
            def body(i, acc):
                k, t = fn()
                return acc + k[i] + t[i]
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        loop_j = jax.jit(loop, static_argnums=0)
        jax.block_until_ready(loop_j(2))
        n = 30
        t0 = time.time()
        jax.block_until_ready(loop_j(n))
        ms = (time.time() - t0) / n * 1000.0
        print(f"{name}: {ms:7.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
