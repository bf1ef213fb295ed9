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
    # reference timing bit-slip wraps counted by the __TRACE__ build
    # (0 when the sweep ran without the trace binary)
    ref_slips: int = 0

    def bers(self) -> tuple[float, float]:
        rb = self.ref[2] / self.ref[3] if self.ref[3] else 0.0
        jb = self.jax[2] / self.jax[3] if self.jax[3] else 0.0
        return rb, jb


def _test_mode_taps() -> np.ndarray:
    """The __TEST__ interpolation filter: 62-tap RRC at 2 samples/symbol
    normalized to unit tap sum (m17_test.cpp:57-59)."""
    return normalize_gain(rrc_filter(0.5, 62, 2), 1.0)


def _shape_wave(dibits: np.ndarray, sigma: float,
                rng: np.random.Generator) -> np.ndarray:
    """Dibits -> noisy 2x/symbol test-mode waveform with guard silence."""
    nch = dibits.shape[0]
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
    return wave.astype(np.float32)


def _lsf_for(nch: int):
    import jax.numpy as jnp

    from ..frame import tx_frames

    dst = jnp.asarray(np.tile(
        bitpack.word_to_bytes(cs.encode_callsign("AB1CDE"), 6), (nch, 1)))
    src = jnp.asarray(np.tile(
        bitpack.word_to_bytes(cs.encode_callsign("G4GUO"), 6), (nch, 1)))
    return tx_frames.build_lsf_bytes(
        dst, src, jnp.full((nch,), M17Type().pack(), dtype=jnp.uint32),
        jnp.zeros((nch, 14), jnp.uint8))


def make_waveforms(nch: int, nf: int, sigma: float, seed: int,
                   kind: str = "stream"):
    """Build nch independent noisy session waveforms of one frame type.

    kind="stream": voice sessions; truth = payloads [nch, nf, 16].
    kind="packet": one packet superframe of nf 25-byte chunks per
      session (data length nf*25-2, CRC fills the final chunk); truth
      = (chunks [nch, nf, 25], data [nch, nf*25-2]).
    kind="bert": nf PRBS9 BERT frames per session; truth = expected
      bit frames [nf, 197] (identical for every channel -- the PRBS
      phase advances 197 bits/frame from 0, m17_prbs9.cpp:27-32).

    Returns (wave [nch, T2] float32, truth), T2 a multiple of CHUNK_2X
    with GUARD_BLOCKS of silence on both ends.
    """
    import jax.numpy as jnp

    from ..pipeline import tx as txp
    from ..spec import crc as crcm
    from ..spec.prbs import BERT_FRAME_BITS, PRBS9_LEN, PRBS9_SEQUENCE

    rng = np.random.default_rng(seed)
    if kind == "stream":
        payloads = rng.integers(0, 256, (nch, nf, 16), dtype=np.uint8)
        dibits = np.asarray(txp.build_voice_session_dibits(
            _lsf_for(nch), jnp.asarray(payloads)))
        return _shape_wave(dibits, sigma, rng), payloads
    if kind == "packet":
        assert nf <= 32, "packet frame counter is 5 bits"
        length = nf * 25 - 2
        data = rng.integers(0, 256, (nch, length), dtype=np.uint8)
        dibits = np.asarray(txp.build_packet_session_dibits(
            _lsf_for(nch), jnp.asarray(data)))
        chunks = np.asarray(
            crcm.crc16_append(jnp.asarray(data))).reshape(nch, nf, 25)
        return _shape_wave(dibits, sigma, rng), (chunks, data)
    if kind == "bert":
        dibits = np.asarray(txp.build_bert_session_dibits(nch, nf))
        idx = (np.arange(nf)[:, None] * BERT_FRAME_BITS
               + np.arange(BERT_FRAME_BITS)[None, :]) % PRBS9_LEN
        return _shape_wave(dibits, sigma, rng), PRBS9_SEQUENCE[idx]
    raise ValueError(kind)


def signal_power(nch: int = 2, nf: int = 4) -> float:
    """Mean in-session power of the clean waveform (for SNR labels)."""
    wave, _ = make_waveforms(nch, nf, sigma=0.0, seed=0)
    live = wave[np.abs(wave) > 1e-6]
    return float(np.mean(live**2))


class Decodes(NamedTuple):
    """One chain's decoded deliveries, keyed per frame type."""

    stream: dict          # {(ch, fn): 16 payload bytes}
    packet: dict          # {(ch, frame_idx): 25 chunk bytes}
    bert: dict            # {ch: [np.uint8[197] bit frames in order]}
    slips: dict           # {ch: timing bit-slip wraps} (trace runs only)


def run_reference(wave: np.ndarray, workdir: str, jobs: int = 8,
                  nf: int | None = None, trace: bool = False) -> Decodes:
    """Decode with the reference chain.

    One ber_ref PROCESS PER CHANNEL: the reference keeps its framer
    lock and LICH/LSF good-copy in file statics with no reset API, so
    a multi-channel run would let channel N inherit channel N-1's
    CRC-valid LSF and route voice from its first frame -- an artifact
    that inflated the reference's routed counts in the round-2
    artifact (every channel after the first skipped the ~6-frame LICH
    reassembly the protocol requires of a fresh receiver).  Channels
    model independent fresh receivers, so each gets a fresh process;
    `jobs` of them run concurrently (round-4 scale-up to 64ch x 64f).

    Duplicate-key deliveries keep the FIRST occurrence, matching
    score()'s first-write policy (see run_jax).  `nf` (packet sessions
    only) maps the final chunk's eof marker to its frame index.
    """
    import concurrent.futures

    name = "ber_ref_trace" if trace else "ber_ref"
    exe = GOLDEN_DIR / name
    if not exe.exists():
        subprocess.run(["make", "-C", str(GOLDEN_DIR), "-s", name],
                       check=True)

    def one(ch: int) -> tuple[int, str]:
        path = pathlib.Path(workdir) / f"wave{ch}.bin"
        with open(path, "wb") as f:
            f.write(struct.pack("<ii", 1, wave.shape[1]))
            wave[ch].astype("<f4").tofile(f)
        out = subprocess.run([str(exe), str(path)], check=True,
                             capture_output=True, text=True).stdout
        path.unlink()
        return ch, out

    dec = Decodes({}, {}, {}, {})
    with concurrent.futures.ThreadPoolExecutor(jobs) as ex:
        for ch, out in ex.map(one, range(wave.shape[0])):
            lines = out.splitlines()
            if trace:
                # count IN-SESSION bit slips: an index move that wraps
                # the polyphase index is a bit slip (m17_rx_sync.cpp:
                # 53-56, 66-69), but the unlocked loop also wraps
                # harmlessly while random-walking on guard-silence
                # noise -- only wraps between the first and last frame
                # dispatch ("Type:" trace lines) damage decoded frames
                tidx = [i for i, ln in enumerate(lines) if "Type:" in ln]
                n_slip = 0
                if tidx:
                    for ln in lines[tidx[0]:tidx[-1] + 1]:
                        t = ln.split()
                        if (len(t) >= 3 and t[0] == "Sync"
                                and (t[1], t[2]) in (("+", "0"),
                                                     ("-", "39"))):
                            n_slip += 1
                dec.slips[ch] = n_slip
            for line in lines:
                toks = line.split()
                if toks and toks[0] == "Sync":
                    continue
                for m, na in (("P", 3), ("K", 4), ("B", 2)):
                    if m in toks:
                        i = toks.index(m)
                        parts = toks[i:i + 1 + na]
                        break
                else:
                    continue
                if len(parts) != 1 + na:
                    continue
                if m == "P":
                    dec.stream.setdefault(
                        (ch, int(parts[2])), bytes.fromhex(parts[3]))
                elif m == "K":
                    fn, eof = int(parts[2]), int(parts[3])
                    # the final chunk's 5-bit field carries its byte
                    # count, not its index (m17_rx_parse.cpp:172-175)
                    idx = (nf - 1) if (eof and nf) else fn
                    dec.packet.setdefault(
                        (ch, idx), bytes.fromhex(parts[4]))
                else:
                    bits = np.unpackbits(np.frombuffer(
                        bytes.fromhex(parts[2]), np.uint8))[:197]
                    dec.bert.setdefault(ch, []).append(bits)
    return dec


def run_jax(wave: np.ndarray, nf: int | None = None) -> Decodes:
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
    kv = np.asarray(out.packet_valid).reshape(nch, -1)
    kfn = np.asarray(out.packet_fn).reshape(nch, -1)
    keof = np.asarray(out.packet_eof).reshape(nch, -1)
    kdata = np.asarray(out.packet_data).reshape(nch, -1, 25)
    bv = np.asarray(out.bert_valid).reshape(nch, -1)
    bb = np.asarray(out.bert_bits).reshape(nch, bv.shape[1], -1)
    dec = Decodes({}, {}, {}, {})
    for ch in range(nch):
        for j in np.nonzero(sv[ch])[0]:
            # first-write-wins: M17 stream FNs carry no protection, so
            # a later frame whose decoded FN collides with an already-
            # delivered one is an FN corruption, not a re-delivery;
            # overwriting would score the collision against the wrong
            # expected payload (observed: one 60-"bit-error" entry at
            # 7 dB that was a clean decode of a different frame)
            dec.stream.setdefault((ch, int(fn[ch, j])), bytes(pl[ch, j]))
        for j in np.nonzero(kv[ch])[0]:
            idx = (nf - 1) if (keof[ch, j] and nf) else int(kfn[ch, j])
            dec.packet.setdefault((ch, idx), bytes(kdata[ch, j]))
        for j in np.nonzero(bv[ch])[0]:
            dec.bert.setdefault(ch, []).append(
                bb[ch, j].astype(np.uint8)[:197])
    return dec


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


# A frame with > 5% wrong bits is "slip-damaged", not channel noise:
# at any SNR where frames decode at all, post-Viterbi noise errors are
# a few bits (the measured clean-frame tail), while a timing slip
# garbles everything after the slip point -- 10%-50% of the frame.
GARBLE_FRAC = 0.05


def _noslip_set(slips: dict | None, nch: int) -> set:
    """Channels where the reference's trace counted ZERO in-session
    timing slips -- the channel-matched subset on which both chains'
    error rates must agree two-sided (everything slip-related is
    attributed, not averaged away)."""
    if slips is None:
        return set()
    return {ch for ch in range(nch) if slips.get(ch, 0) == 0}


def score_packet(got: dict, chunks: np.ndarray, slips: dict | None = None):
    """Per-frame packet scoring + whole-superframe success counts.

    (frames, total, bit_errors, bits), extra dict.  M17 packet frames
    carry NO per-frame CRC (only the whole superframe does), so a
    chain delivers slip-garbled chunks as readily as clean ones -- the
    extra dict therefore splits the error mass into `garbled_frames`
    (> 25% wrong bits: a trashed symbol stream, not channel noise) vs
    noise-floor errors on clean frames, which is what the typed
    agreement predicate compares.  `packets_ok` counts superframes
    whose every chunk arrived bit-exact -- equivalent to the
    reference's whole-packet CRC gate (m17_rx_parse.cpp:40-46) up to
    CRC collisions, computed identically for both chains."""
    nch, nf, _ = chunks.shape
    noslip = _noslip_set(slips, nch)
    rec = errs = pkts_ok = garbled = clean_errs = 0
    ns_errs = ns_frames = 0
    for ch in range(nch):
        exact = 0
        for f in range(nf):
            pl = got.get((ch, f))
            if pl is None:
                continue
            rec += 1
            x = np.frombuffer(pl, np.uint8) ^ chunks[ch, f]
            e = int(np.unpackbits(x).sum())
            errs += e
            if e == 0:
                exact += 1
            if e > GARBLE_FRAC * 200:
                garbled += 1
            else:
                clean_errs += e
            if ch in noslip:
                ns_errs += e
                ns_frames += 1
        if exact == nf:
            pkts_ok += 1
    return ((rec, nch * nf, errs, rec * 200),
            {"packets_ok": pkts_ok, "packets_total": nch,
             "garbled_frames": garbled, "clean_bit_errors": clean_errs,
             "clean_bits": (rec - garbled) * 200,
             "noslip_channels": len(noslip),
             "noslip_bit_errors": ns_errs,
             "noslip_bits": ns_frames * 200})


def score_bert(got: dict, nch: int, nf: int, slips: dict | None = None):
    """BERT scoring through the PRBS9 stream checker (spec/prbs.py):
    alignment-hunting with predicted-shift accounting, identically for
    both chains.  (frames, total, bit_errors, bits_counted), extra.
    Unsynced frames (no PRBS alignment held -- garbled) are booked at
    the estimated 50% rate; the extra dict separates them from the
    measured noise-floor errors on aligned frames."""
    from ..spec import prbs

    noslip = _noslip_set(slips, nch)
    rec = errs = bits = garbled = clean_errs = 0
    ns_errs = ns_frames = 0
    thresh = GARBLE_FRAC * 197
    for ch in range(nch):
        frames = got.get(ch, [])
        if not frames:
            continue
        e, n, _ = prbs.check_stream(np.stack(frames))
        rec += len(frames)
        errs += e
        bits += n
        per = prbs.check_stream_frames(np.stack(frames))
        damaged = (per < 0) | (per > thresh)
        garbled += int(damaged.sum())
        clean_errs += int(per[~damaged].sum())
        if ch in noslip:
            ns_errs += e
            ns_frames += len(frames)
    return ((rec, nch * nf, errs, bits),
            {"garbled_frames": garbled,
             "clean_bit_errors": clean_errs,
             "clean_bits": (rec - garbled) * 197,
             "noslip_channels": len(noslip),
             "noslip_bit_errors": ns_errs,
             "noslip_bits": ns_frames * 197})


class TypedParityPoint(NamedTuple):
    """Parity point for the packet/BERT frame types (round-4 broadening;
    same ref/jax tuple shape as ParityPoint so the agreement predicates
    apply unchanged)."""

    kind: str
    snr_db: float
    sigma: float
    ref: tuple[int, int, int, int]
    jax: tuple[int, int, int, int]
    extra: dict

    def bers(self) -> tuple[float, float]:
        rb = self.ref[2] / self.ref[3] if self.ref[3] else 0.0
        jb = self.jax[2] / self.jax[3] if self.jax[3] else 0.0
        return rb, jb


def run_parity(snr_points_db, nch: int, nf: int, workdir: str,
               seed: int = 0, min_fn: int = 8, kind: str = "stream",
               jobs: int = 8):
    """Shared-waveform BER parity sweep over an SNR grid.

    kind="stream" (default): sessions carry nf stream frames; scoring
    starts at min_fn (see score()), so use nf comfortably above
    min_fn; returns ParityPoint list.  kind="packet"/"bert" score
    those frame types (min_fn is ignored -- neither path is gated on
    LICH assembly, m17_rx_parse.cpp:161-180) and return
    TypedParityPoint lists."""
    p_sig = signal_power(min(nch, 2), min(nf, 16))
    points = []
    for i, snr in enumerate(snr_points_db):
        sigma = float(np.sqrt(p_sig / (10.0 ** (snr / 10.0))))
        wave, truth = make_waveforms(nch, nf, sigma,
                                     seed=seed + 1000 * i, kind=kind)
        # trace build: count the reference's timing bit-slip wraps --
        # the dissection evidence for its high-SNR losses (each wrap
        # garbles the in-progress frame and misaligns the following
        # ones until the 5-error budget forces LOS + re-hunt)
        ref = run_reference(wave, workdir, jobs=jobs, nf=nf, trace=True)
        jx = run_jax(wave, nf=nf)
        ref_slips = int(sum(ref.slips.values()))
        if kind == "stream":
            points.append(ParityPoint(
                snr_db=float(snr), sigma=sigma,
                ref=score(ref.stream, truth, min_fn),
                jax=score(jx.stream, truth, min_fn),
                ref_slips=ref_slips))
        elif kind == "packet":
            chunks, _ = truth
            # both chains' noslip split uses the REFERENCE's slip set:
            # the comparison is channel-matched on channels where the
            # reference saw no in-session slip
            r, rex = score_packet(ref.packet, chunks, slips=ref.slips)
            j, jex = score_packet(jx.packet, chunks, slips=ref.slips)
            rex["timing_slips"] = ref_slips
            points.append(TypedParityPoint(
                kind, float(snr), sigma, r, j,
                {"ref": rex, "jax": jex}))
        else:
            r, rex = score_bert(ref.bert, nch, nf, slips=ref.slips)
            j, jex = score_bert(jx.bert, nch, nf, slips=ref.slips)
            rex["timing_slips"] = ref_slips
            points.append(TypedParityPoint(
                kind, float(snr), sigma, r, j,
                {"ref": rex, "jax": jex}))
    return points


def typed_agreement_ok(p: TypedParityPoint, z: float = 4.0,
                       abs_slack: float = 0.001) -> bool:
    """Agreement predicate for the packet/BERT frame types.

    These frames carry NO per-frame CRC, so each chain delivers its
    slip-garbled frames as payload; the reference garbles and drops
    more of them at high SNR (timing-wrap slips, counted per channel
    by the __TRACE__ build) while this chain's in-lock resync recovers
    them -- a capability asymmetry, not an implementation divergence.
    Parity therefore requires:
      1. frame recovery at least the reference's (frame_agreement_ok);
      2. CLEAN-frame BER equality: a two-proportion z-test over each
         chain's non-garbled frames -- the channel physics both chains
         share.  (Measured: with ber_ref's depuncture erasure handled
         correctly, both chains decode clean frames with IDENTICAL
         error statistics; the reference's entire residual error mass
         at high SNR sits in garbled acquisition-boundary and
         slip-damaged frames, which test 3 bounds);
      3. this chain garbles at most as many frames as the reference.
    """
    if not frame_agreement_ok(p):
        return False
    rex, jex = p.extra["ref"], p.extra["jax"]
    n1 = max(rex["clean_bits"], 1)
    n2 = max(jex["clean_bits"], 1)
    rb = rex["clean_bit_errors"] / n1
    jb = jex["clean_bit_errors"] / n2
    pooled = (rex["clean_bit_errors"]
              + jex["clean_bit_errors"]) / (n1 + n2)
    se = np.sqrt(max(pooled * (1 - pooled), 1e-12) * (1 / n1 + 1 / n2))
    if abs(rb - jb) > z * se + abs_slack:
        return False
    m1, m2 = max(p.ref[0], 1), max(p.jax[0], 1)
    g1 = rex["garbled_frames"] / m1
    g2 = jex["garbled_frames"] / m2
    pooled_g = (rex["garbled_frames"] + jex["garbled_frames"]) / (m1 + m2)
    g_se = np.sqrt(max(pooled_g * (1 - pooled_g), 1e-12)
                   * (1 / m1 + 1 / m2))
    return g2 <= g1 + z * g_se + 0.02


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
