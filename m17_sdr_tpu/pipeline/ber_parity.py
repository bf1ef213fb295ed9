"""Measured BER parity vs the reference RX chain (BASELINE's
correctness bound; SURVEY.md section 6).

Shared-waveform methodology: ONE generator produces noisy
2-samples/symbol baseband waveforms -- voice sessions (preamble + LSF +
stream frames + EOT) shaped by the test-mode RRC at the reference's
{+-0.3, +-1.0} amplitude map (m17_test.cpp:16, 29-41) plus AWGN.  The
identical float32 samples are then decoded by

  (a) the reference chain compiled in place from /root/reference
      (tests/golden_gen/ber_ref.cpp: m17_rx_sync.cpp timing recovery ->
      m17_rx_frame.cpp framer -> m17_rx_parse.cpp stream decode), and
  (b) this framework's soft-domain pipeline (pipeline.rx.rx_stream_soft),

so per-SNR agreement of frame recovery and payload BER compares the
implementations directly on the same noise realizations.
"""

from __future__ import annotations

import pathlib
import struct
import subprocess
from typing import NamedTuple

import numpy as np

from ..dsp.filters import normalize_gain, rrc_filter
from ..spec import bits as bitpack
from ..spec import callsign as cs
from ..spec.typefield import M17Type

GOLDEN_DIR = pathlib.Path(__file__).resolve().parents[2] / "tests" / "golden_gen"
CHUNK_2X = 384               # samples per block in the 2x/symbol domain
GUARD_BLOCKS = 3             # leading/trailing silence blocks per session

# the reference test-mode symbol map (m17_test.cpp:16)
_SYM_AMP = np.array([0.3, 1.0, -0.3, -1.0], dtype=np.float32)


class ParityPoint(NamedTuple):
    snr_db: float
    sigma: float
    # per chain: (frames recovered, total frames, payload bit errors,
    # payload bits among recovered frames)
    ref: tuple[int, int, int, int]
    jax: tuple[int, int, int, int]

    def bers(self) -> tuple[float, float]:
        rb = self.ref[2] / self.ref[3] if self.ref[3] else 0.0
        jb = self.jax[2] / self.jax[3] if self.jax[3] else 0.0
        return rb, jb


def _test_mode_taps() -> np.ndarray:
    """The __TEST__ interpolation filter: 62-tap RRC at 2 samples/symbol
    normalized to unit tap sum (m17_test.cpp:57-59)."""
    return normalize_gain(rrc_filter(0.5, 62, 2), 1.0)


def make_waveforms(nch: int, nf: int, sigma: float, seed: int):
    """Build nch independent noisy voice-session waveforms.

    Returns (wave [nch, T2] float32, payloads [nch, nf, 16] uint8) with
    T2 a multiple of CHUNK_2X and GUARD_BLOCKS of silence on both ends.
    """
    import jax.numpy as jnp

    from ..frame import tx_frames
    from ..pipeline import tx as txp

    rng = np.random.default_rng(seed)
    dst = jnp.asarray(np.tile(
        bitpack.word_to_bytes(cs.encode_callsign("AB1CDE"), 6), (nch, 1)))
    src = jnp.asarray(np.tile(
        bitpack.word_to_bytes(cs.encode_callsign("G4GUO"), 6), (nch, 1)))
    lsf = tx_frames.build_lsf_bytes(
        dst, src, jnp.full((nch,), M17Type().pack(), dtype=jnp.uint32),
        jnp.zeros((nch, 14), jnp.uint8))
    payloads = rng.integers(0, 256, (nch, nf, 16), dtype=np.uint8)
    dibits = np.asarray(
        txp.build_voice_session_dibits(lsf, jnp.asarray(payloads)))

    syms = _SYM_AMP[dibits]                              # [nch, NSYM]
    up = np.zeros((nch, syms.shape[1] * 2), np.float32)
    up[:, ::2] = syms                                    # 2 samples/symbol
    taps = _test_mode_taps()
    wave = np.stack([np.convolve(ch, taps, mode="full")[: up.shape[1]]
                     for ch in up])
    guard = np.zeros((nch, GUARD_BLOCKS * CHUNK_2X), np.float32)
    wave = np.concatenate([guard, wave, guard], axis=1)
    pad = (-wave.shape[1]) % CHUNK_2X
    if pad:
        wave = np.pad(wave, [(0, 0), (0, pad)])
    wave = wave + rng.normal(0.0, sigma, wave.shape).astype(np.float32)
    return wave.astype(np.float32), payloads


def signal_power(nch: int = 2, nf: int = 4) -> float:
    """Mean in-session power of the clean waveform (for SNR labels)."""
    wave, _ = make_waveforms(nch, nf, sigma=0.0, seed=0)
    live = wave[np.abs(wave) > 1e-6]
    return float(np.mean(live**2))


def run_reference(wave: np.ndarray, workdir: str) -> dict:
    """Decode with the reference chain.  Returns {(ch, fn): bytes}.

    One ber_ref PROCESS PER CHANNEL: the reference keeps its framer
    lock and LICH/LSF good-copy in file statics with no reset API, so
    a multi-channel run would let channel N inherit channel N-1's
    CRC-valid LSF and route voice from its first frame -- an artifact
    that inflated the reference's routed counts in the round-2
    artifact (every channel after the first skipped the ~6-frame LICH
    reassembly the protocol requires of a fresh receiver).  Channels
    model independent fresh receivers, so each gets a fresh process.

    Duplicate-fn deliveries keep the FIRST occurrence, matching
    score()'s first-write policy (see run_jax).
    """
    exe = GOLDEN_DIR / "ber_ref"
    if not exe.exists():
        subprocess.run(["make", "-C", str(GOLDEN_DIR), "-s", "ber_ref"],
                       check=True)
    got: dict[tuple[int, int], bytes] = {}
    path = pathlib.Path(workdir) / "wave.bin"
    for ch in range(wave.shape[0]):
        with open(path, "wb") as f:
            f.write(struct.pack("<ii", 1, wave.shape[1]))
            wave[ch].astype("<f4").tofile(f)
        out = subprocess.run([str(exe), str(path)], check=True,
                             capture_output=True, text=True).stdout
        for line in out.splitlines():
            parts = line.split()
            if len(parts) == 4 and parts[0] == "P":
                got.setdefault((ch, int(parts[2])), bytes.fromhex(parts[3]))
    return got


def run_jax(wave: np.ndarray) -> dict:
    """Decode with this framework's soft-domain pipeline."""
    import jax.numpy as jnp

    from .rx import RxSessionState, rx_stream_soft

    nch, t2 = wave.shape
    blocks = jnp.asarray(wave.reshape(nch, t2 // CHUNK_2X, CHUNK_2X))
    out, _ = rx_stream_soft(blocks, RxSessionState.init(nch))
    # score what the chain ROUTES (stream_gate = LICH-known + quality
    # gate), matching the reference side which prints what its parse
    # layer hands to the vocoder (m17_rx_parse.cpp:148-159); scoring
    # pre-gate deliveries let round 2's slip-garbled frames through as
    # "valid" payloads (VERDICT round 2 weak #3)
    sv = np.asarray(out.stream_gate).reshape(nch, -1)
    fn = np.asarray(out.stream_fn).reshape(nch, -1)
    pl = np.asarray(out.stream_payload).reshape(nch, -1, 16)
    got: dict[tuple[int, int], bytes] = {}
    for ch in range(nch):
        for j in np.nonzero(sv[ch])[0]:
            # first-write-wins: M17 stream FNs carry no protection, so
            # a later frame whose decoded FN collides with an already-
            # delivered one is an FN corruption, not a re-delivery;
            # overwriting would score the collision against the wrong
            # expected payload (observed: one 60-"bit-error" entry at
            # 7 dB that was a clean decode of a different frame)
            got.setdefault((ch, int(fn[ch, j])), bytes(pl[ch, j]))
    return got


def score(got: dict, payloads: np.ndarray,
          min_fn: int = 0) -> tuple[int, int, int, int]:
    """(frames recovered, total frames, bit errors, bits recovered).

    min_fn scores steady state only: the reference routes voice solely
    through its assembled-LICH CRC gate (update_lich,
    m17_rx_parse.cpp:71-85 -- its LSF-frame path never saves the good
    copy, the m_packet CRC bug at :98), so its first ~6 stream frames
    per session are structurally unroutable at ANY SNR.  Parity is
    meaningful from the first frame both chains can route.
    """
    nch, nf, _ = payloads.shape
    rec = errs = 0
    for ch in range(nch):
        for f in range(min_fn, nf):
            pl = got.get((ch, f))
            if pl is None:
                continue
            rec += 1
            x = np.frombuffer(pl, np.uint8) ^ payloads[ch, f]
            errs += int(np.unpackbits(x).sum())
    return rec, nch * (nf - min_fn), errs, rec * 128


def run_parity(snr_points_db, nch: int, nf: int, workdir: str,
               seed: int = 0, min_fn: int = 8) -> list[ParityPoint]:
    """Shared-waveform BER parity sweep over an SNR grid.

    Sessions carry nf stream frames; scoring starts at min_fn (see
    score()), so use nf comfortably above min_fn."""
    p_sig = signal_power(min(nch, 2), nf)
    points = []
    for i, snr in enumerate(snr_points_db):
        sigma = float(np.sqrt(p_sig / (10.0 ** (snr / 10.0))))
        wave, payloads = make_waveforms(nch, nf, sigma, seed=seed + 1000 * i)
        ref = score(run_reference(wave, workdir), payloads, min_fn)
        jx = score(run_jax(wave), payloads, min_fn)
        points.append(ParityPoint(snr_db=float(snr), sigma=sigma,
                                  ref=ref, jax=jx))
    return points


def parity_to_json(points: list[ParityPoint]) -> dict:
    out = {"methodology": "shared-waveform: identical noisy samples "
                          "decoded by the in-place-compiled reference "
                          "chain and the JAX chain", "points": []}
    for p in points:
        rb, jb = p.bers()
        out["points"].append({
            "snr_db": p.snr_db, "sigma": round(p.sigma, 6),
            "ref": {"frames": p.ref[0], "total": p.ref[1],
                    "bit_errors": p.ref[2], "bits": p.ref[3],
                    "ber": round(rb, 6)},
            "jax": {"frames": p.jax[0], "total": p.jax[1],
                    "bit_errors": p.jax[2], "bits": p.jax[3],
                    "ber": round(jb, 6)},
        })
    return out


def ber_agreement_ok(p: ParityPoint, z: float = 4.0,
                     abs_slack: float = 0.001) -> bool:
    """Two-proportion agreement within z binomial standard errors
    (plus a small absolute slack for near-zero BERs).

    abs_slack is deliberately BELOW the round-2 corruption effect size
    (2.4e-3 BER at 10 dB from slip-garbled frames, BER_PARITY.json):
    this predicate fails on the ungated round-2 behavior and passes
    with the stream quality gate (tests/test_ber_parity.py)."""
    n1, n2 = max(p.ref[3], 1), max(p.jax[3], 1)
    rb, jb = p.bers()
    pooled = (p.ref[2] + p.jax[2]) / (n1 + n2)
    se = np.sqrt(max(pooled * (1 - pooled), 1e-12) * (1 / n1 + 1 / n2))
    return abs(rb - jb) <= z * se + abs_slack


def frame_agreement_ok(p: ParityPoint, z: float = 4.0,
                       abs_slack: float = 0.08) -> bool:
    """Frame recovery must be AT LEAST the reference's (within binomial
    confidence).  Exceeding it is a win, not a parity violation: the
    measured sweeps show this chain recovers more frames at every SNR
    (the reference loses ~10-15% of steady-state frames even at 10-14dB
    to timing-wrap slip storms and its slower re-acquisition)."""
    n = max(p.ref[1], 1)
    r1, r2 = p.ref[0] / n, p.jax[0] / n
    pooled = (p.ref[0] + p.jax[0]) / (2 * n)
    se = np.sqrt(max(pooled * (1 - pooled), 1e-12) * 2 / n)
    return r2 >= r1 - (z * se + abs_slack)
