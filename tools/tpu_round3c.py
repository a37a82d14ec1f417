"""Round-3 batch C: one-shot retest of dynamic gather inside Mosaic
(NOTES_R3.md: crashed the remote compile helper with HTTP 500 on the
round-2 toolchain; retest on toolchain bumps).  Isolated in its own
process so a crash cannot take other experiments down.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    emit(probe="mosaic_dynamic_gather", jax=jax.__version__)

    # 1. lane-dim take_along_axis on a (8, 128) tile inside a kernel
    def k1(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

    x = jnp.arange(8 * 128, dtype=jnp.uint32).reshape(8, 128)
    idx = jnp.broadcast_to(jnp.arange(127, -1, -1, dtype=jnp.int32), (8, 128))
    try:
        out = pl.pallas_call(
            k1, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32)
        )(x, idx)
        ok = bool(np.array_equal(np.asarray(out), np.asarray(x)[:, ::-1]))
        emit(gather_lane_8x128="ok" if ok else "WRONG", parity=ok)
    except Exception as e:  # noqa: BLE001
        emit(gather_lane_8x128="crash", err=str(e)[:200])

    # 2. bigger tile (256, 512), gather along lanes
    def k2(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

    x2 = jnp.arange(256 * 512, dtype=jnp.uint32).reshape(256, 512)
    i2 = jnp.broadcast_to(
        jnp.arange(511, -1, -1, dtype=jnp.int32), (256, 512)
    )
    try:
        out = pl.pallas_call(
            k2, out_shape=jax.ShapeDtypeStruct((256, 512), jnp.uint32)
        )(x2, i2)
        ok = bool(np.array_equal(np.asarray(out), np.asarray(x2)[:, ::-1]))
        emit(gather_lane_256x512="ok" if ok else "WRONG", parity=ok)
        if ok:
            # timing at scale: (4096, 4096) random lane gather
            rng = np.random.default_rng(0)
            xb = jax.device_put(
                rng.integers(0, 1 << 32, (4096, 4096), np.uint32)
            )
            ib = jax.device_put(
                rng.integers(0, 4096, (4096, 4096), np.int32)
            )

            @jax.jit
            def big(x, i):
                r = pl.pallas_call(
                    k2,
                    grid=(16,),
                    in_specs=[
                        pl.BlockSpec((256, 4096), lambda t: (t, 0)),
                        pl.BlockSpec((256, 4096), lambda t: (t, 0)),
                    ],
                    out_specs=pl.BlockSpec((256, 4096), lambda t: (t, 0)),
                    out_shape=jax.ShapeDtypeStruct((4096, 4096), jnp.uint32),
                )(x, i)
                return r.ravel()[-1]

            int(np.asarray(big(xb, ib)))
            t0 = time.perf_counter()
            outs = [big(xb, ib) for _ in range(4)]
            for o in outs:
                int(np.asarray(o))
            emit(
                gather_lane_2_24_ms=round(
                    (time.perf_counter() - t0) / 4 * 1e3, 1
                )
            )
    except Exception as e:  # noqa: BLE001
        emit(gather_lane_256x512="crash", err=str(e)[:200])

    emit(done="batch_c")


if __name__ == "__main__":
    main()
