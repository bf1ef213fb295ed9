#!/usr/bin/env python
"""Real-TPU hardware self-test: compiled Pallas Viterbi vs the XLA path.

Round 1 only exercised the Pallas kernel through the interpreter in CI
(and implicitly via bench); this runs the COMPILED kernel on the real
chip and checks it against the XLA decoder on (a) random soft bits,
(b) clean encoded codewords, (c) noisy codewords at the M17 trellis
lengths (m17_conv.cpp:148-168 equivalents).  All comparisons reduce
on-device; exactly one scalar crosses to the host (axon tunnel rule).

Usage: python tools/tpu_selftest.py   (prints one JSON line, rc 0 on pass)
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> int:
    import os

    import jax

    # persistent compile cache: the tunnel's per-shape compiles dominate
    cache = os.environ.get(
        "M17_JAX_CACHE", os.path.expanduser("~/.cache/m17_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from m17_sdr_tpu.fec.conv import conv_encode_bits
    from m17_sdr_tpu.fec.viterbi import viterbi_decode_xla
    from m17_sdr_tpu.fec.viterbi_pallas import viterbi_decode_pallas

    platform = jax.devices()[0].platform
    rng = np.random.default_rng(0)
    checks = []

    total_mismatch = jnp.zeros((), jnp.int32)
    for t_steps in [244, 148, 210, 201]:
        # (a) random soft input: both decoders must take the same path
        soft = jnp.asarray(
            rng.normal(size=(128, 2 * t_steps)).astype(np.float32))
        b_ref = viterbi_decode_xla(soft)
        b_pal = viterbi_decode_pallas(soft)
        total_mismatch += jnp.sum(jnp.abs(
            b_ref.astype(jnp.int32) - b_pal.astype(jnp.int32)))
        checks.append(f"random_t{t_steps}")

        # (b,c) encoded payloads, clean and at ~3 dB noise
        nbits = t_steps - 4
        bits = jnp.asarray(rng.integers(0, 2, (128, nbits), dtype=np.uint8))
        coded = conv_encode_bits(bits)
        clean = jnp.where(coded > 0, 1.0, -1.0).astype(jnp.float32)
        noisy = clean + jnp.asarray(
            rng.normal(0, 0.5, clean.shape).astype(np.float32))
        for soft2, tag in [(clean, "clean"), (noisy, "noisy")]:
            b_pal = viterbi_decode_pallas(soft2)
            b_ref = viterbi_decode_xla(soft2)
            total_mismatch += jnp.sum(jnp.abs(
                b_pal.astype(jnp.int32) - b_ref.astype(jnp.int32)))
            if tag == "clean":
                # the compiled kernel must exactly invert the encoder
                total_mismatch += jnp.sum(jnp.abs(
                    b_pal[:, :nbits].astype(jnp.int32)
                    - bits.astype(jnp.int32)))
            checks.append(f"{tag}_t{t_steps}")

    mism = int(jax.device_get(total_mismatch))   # the ONE transfer
    print(json.dumps({"platform": platform, "checks": checks,
                      "bit_mismatches": mism, "ok": mism == 0}))
    return 0 if mism == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
