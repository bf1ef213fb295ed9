#!/usr/bin/env python
"""Validate the fused Pallas receiver end to end on the current backend.

Runs a full modulated voice session (FM chain, 4096 channels) through
rx_block with BOTH receiver formulations and scores decoded payloads
against the transmitted ones entirely on device (one scalar transfer).
This is the acceptance gate for bench.py's Pallas default.

Usage: python tools/pallas_validate.py   (one JSON line, rc 0 on pass)
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> int:
    import os

    import jax

    cache = os.environ.get(
        "M17_JAX_CACHE", os.path.expanduser("~/.cache/m17_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from m17_sdr_tpu.frame import tx_frames
    from m17_sdr_tpu.pipeline import tx as txp
    from m17_sdr_tpu.pipeline.rx import RxSessionState, rx_block
    from m17_sdr_tpu.spec import bits as bitpack
    from m17_sdr_tpu.spec import callsign
    from m17_sdr_tpu.spec.typefield import M17Type

    batch, block, b0, nf = 4096, 1920, 64, 8
    dst = jnp.asarray(np.tile(
        bitpack.word_to_bytes(callsign.encode_callsign("AB1CDE"), 6),
        (b0, 1)))
    src = jnp.asarray(np.tile(
        bitpack.word_to_bytes(callsign.encode_callsign("G4GUO"), 6),
        (b0, 1)))
    lsf = tx_frames.build_lsf_bytes(
        dst, src, jnp.full((b0,), M17Type().pack(), dtype=jnp.uint32),
        jnp.zeros((b0, 14), jnp.uint8))
    rng = np.random.default_rng(0)
    payloads = jnp.asarray(rng.integers(0, 256, (b0, nf, 16),
                                        dtype=np.uint8))
    dibits = txp.build_voice_session_dibits(lsf, payloads)
    iq, _ = txp.dibits_to_iq(dibits)
    nblk = iq.shape[-1] // block

    @jax.jit
    def make_blocks(iq):
        blk = jnp.moveaxis(
            iq[:, :, : nblk * block].reshape(b0, 2, nblk, block), 1, 2)
        return jnp.tile(blk, (batch // b0, 1, 1, 1))

    blocks = make_blocks(iq)
    expect = jnp.tile(payloads, (batch // b0, 1, 1))       # [batch, nf, 16]

    def run(use_pallas):
        st = RxSessionState.init(batch)
        got = jnp.zeros((batch, nf, 16), jnp.uint8)
        have = jnp.zeros((batch, nf), bool)
        for i in range(nblk):
            out, st = rx_block(blocks[:, i], st, use_pallas=use_pallas)
            fn = out.stream_fn.astype(jnp.int32)            # [batch, F]
            for s in range(fn.shape[1]):
                ok = out.stream_valid[:, s] & (fn[:, s] < nf)
                idx = jnp.clip(fn[:, s], 0, nf - 1)
                onehot = (jnp.arange(nf)[None, :] == idx[:, None]) \
                    & ok[:, None]
                got = jnp.where(onehot[..., None],
                                out.stream_payload[:, s][:, None, :], got)
                have = have | onehot
        frames = jnp.sum(have)
        errs = jnp.sum(jnp.where(
            have[..., None],
            jnp.not_equal(got, expect).astype(jnp.int32), 0))
        return frames, errs

    fx, ex = run(False)
    fp, ep = run(True)
    res = jax.device_get((fx, ex, fp, ep))
    fx, ex, fp, ep = (int(x) for x in res)
    ok = (fp == fx) and (ep == 0) and (ex == 0) and fx == batch * nf
    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "xla": {"frames": fx, "byte_errors": ex},
        "pallas": {"frames": fp, "byte_errors": ep},
        "expected_frames": batch * nf,
        "ok": bool(ok),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
