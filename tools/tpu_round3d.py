"""Round-3 batch D: map the boundary of the now-partially-open Mosaic
dynamic-gather door — which (rows, lanes) tile shapes lower, and how fast.
Each probe isolated with try/except; crashes only kill later probes in
the same process, so order cheap->risky.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def emit(**kw):
    print(json.dumps(kw), flush=True)


def probe(rows, lanes, dtype=jnp.uint32):
    def k(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

    x = jnp.arange(rows * lanes, dtype=dtype).reshape(rows, lanes)
    idx = jnp.broadcast_to(
        jnp.arange(lanes - 1, -1, -1, dtype=jnp.int32), (rows, lanes)
    )
    try:
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((rows, lanes), dtype)
        )(x, idx)
        ok = bool(np.array_equal(np.asarray(out), np.asarray(x)[:, ::-1]))
        emit(shape=f"{rows}x{lanes}", status="ok" if ok else "WRONG")
        return ok
    except Exception as e:  # noqa: BLE001
        emit(shape=f"{rows}x{lanes}", status="crash", err=str(e)[:90])
        return False


def main():
    # ladder: rows first at 128 lanes, then lanes at 8 rows
    ok_128_lanes = []
    for rows in (8, 16, 64, 256, 1024):
        if not probe(rows, 128):
            break
        ok_128_lanes.append(rows)
    for lanes in (256, 512, 1024):
        if not probe(8, lanes):
            break

    # timing: biggest working config, full 2^24 elements via grid
    if 256 in ok_128_lanes or 1024 in ok_128_lanes:
        rows = 1024 if 1024 in ok_128_lanes else 256

        def k(x_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(
                x_ref[...], i_ref[...], axis=1
            )

        rng = np.random.default_rng(0)
        R = 1 << 17  # 2^17 rows x 128 lanes = 2^24
        xb = jax.device_put(rng.integers(0, 1 << 32, (R, 128), np.uint32))
        ib = jax.device_put(rng.integers(0, 128, (R, 128), np.int32))

        @jax.jit
        def big(x, i):
            r = pl.pallas_call(
                k,
                grid=(R // rows,),
                in_specs=[
                    pl.BlockSpec((rows, 128), lambda t: (t, 0)),
                    pl.BlockSpec((rows, 128), lambda t: (t, 0)),
                ],
                out_specs=pl.BlockSpec((rows, 128), lambda t: (t, 0)),
                out_shape=jax.ShapeDtypeStruct((R, 128), jnp.uint32),
            )(x, i)
            return r.ravel()[-1]

        try:
            int(np.asarray(big(xb, ib)))
            t0 = time.perf_counter()
            outs = [big(xb, ib) for _ in range(4)]
            for o in outs:
                int(np.asarray(o))
            emit(
                gather128_2_24_ms=round(
                    (time.perf_counter() - t0) / 4 * 1e3, 1
                ),
                tile_rows=rows,
            )
        except Exception as e:  # noqa: BLE001
            emit(gather128_2_24="crash", err=str(e)[:90])

    emit(done="batch_d")


if __name__ == "__main__":
    main()
