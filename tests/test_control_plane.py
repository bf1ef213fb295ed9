"""Control plane: PTT wiring, duplex circuit, gateway NET->RF LSF
(VERDICT round-1 item 5).

Reference behaviors under test:
  - MMI tx/rx/td/tc key the radio + GPIO (mmi.cpp:110-131,
    radio.cpp:74-109) -- the CLI must install a live on_ptt hook.
  - radio_duplex / PTT_DP runs TX and RX concurrently
    (m17_tx_rx.cpp:121-158).
  - A gatewayed NET->RF stream keys up with the LSF rebuilt from the
    received frame's LICH, not the gateway's own identity
    (m17_tx_rx.cpp:47, m17_tx_routines.cpp:121-137).
"""

import json
import subprocess
import sys

import numpy as np

from m17_sdr_tpu.app.main import _mk_session, build_parser
from m17_sdr_tpu.app.session import GATEWAY_KEYUP_THRESHOLD, Session
from m17_sdr_tpu.io.reflector import pack_voice_frame
from m17_sdr_tpu.spec import bits as bitpack
from m17_sdr_tpu.spec import callsign as cs


class TestPttWiring:
    def test_mmi_ptt_commands_key_gpio(self):
        args = build_parser().parse_args(["repl"])
        sess, mmi = _mk_session(args)
        assert not sess.ptt.get()
        assert mmi.parse("tx") == "OK"
        assert sess.ptt.get() and sess.db.ptt
        assert mmi.parse("rx") == "OK"
        assert not sess.ptt.get() and not sess.db.ptt
        assert mmi.parse("tc") == "OK"          # carrier keys up too
        assert sess.ptt.get()
        assert mmi.parse("rx") == "OK"
        assert mmi.parse("td") == "OK"          # duplex keys up
        assert sess.ptt.get()
        assert sess.db.extra["ptt_mode"] == "dp"

    def test_tx_file_keys_ptt_for_burst(self, tmp_path):
        sess = Session()
        states = []
        orig_set, orig_clear = sess.ptt.set, sess.ptt.clear
        sess.ptt.set = lambda: (states.append("on"), orig_set())[1]
        sess.ptt.clear = lambda: (states.append("off"), orig_clear())[1]
        sess.tx_file(str(tmp_path / "t.iq"), n_frames=2)
        assert states == ["on", "off"]
        assert not sess.ptt.get()


class TestDuplex:
    def test_duplex_circuit(self, tmp_path):
        """TX to one file while decoding another, concurrently."""
        cap = str(tmp_path / "in.iq")
        out = str(tmp_path / "out.iq")
        Session().tx_file(cap, n_frames=4)

        sess = Session()
        sess.db.tx_src_call = "G4GUO"
        stats = sess.duplex_file(cap, out, n_frames=3,
                                 payload_out=str(tmp_path / "p.bin"))
        assert stats["rx"]["payload_frames"] == 4
        assert stats["tx"]["frames"] == 3
        # the transmitted side must itself decode
        check = Session().rx_file(out)
        assert check["payload_frames"] == 3
        assert check["lsf"]["src"] == "G4GUO"
        assert not sess.ptt.get()

    def test_duplex_cli(self, tmp_path):
        cap = str(tmp_path / "in.iq")
        Session().tx_file(cap, n_frames=2)
        r = subprocess.run(
            [sys.executable, "-m", "m17_sdr_tpu.app.main",
             "--platform", "cpu", "duplex", "--in", cap,
             "--out", str(tmp_path / "o.iq"), "--frames", "2"],
            check=True, capture_output=True, text=True, cwd="/root/repo")
        stats = json.loads(r.stdout.splitlines()[-1])
        assert stats["rx"]["payload_frames"] == 2
        assert stats["tx"]["frames"] == 2


class _QueueReflector:
    """Stand-in reflector client holding pre-queued voice frames."""

    active = True

    def __init__(self, frames):
        self._frames = frames

    def poll(self):
        f, self._frames = self._frames, []
        return f

    def send_voice(self, *a, **k):
        pass


class TestGatewayNetToRf:
    def test_rf_lsf_comes_from_received_lich(self, tmp_path):
        """The RF key-up must carry the ORIGINATOR's callsigns/meta from
        the network frame's LICH, not the gateway's local identity."""
        from m17_sdr_tpu.io.reflector import parse_voice_frame

        # network stream originated by M0ABC -> BROADCAST with META
        dst = bitpack.word_to_bytes(0xFFFFFFFFFFFF, 6)
        src = bitpack.word_to_bytes(cs.encode_callsign("M0ABC"), 6)
        meta = bytes(range(14))
        lich28 = bytes(dst) + bytes(src) + b"\x00\x05" + meta
        rng = np.random.default_rng(0)
        frames = []
        for fn in range(GATEWAY_KEYUP_THRESHOLD + 2):
            pl = rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
            vf = parse_voice_frame(
                pack_voice_frame(0x1234, lich28, fn, pl))
            frames.append(vf)

        sess = Session()
        sess.db.tx_src_call = "GATEWAY1"     # must NOT appear on RF
        sess.reflector = _QueueReflector(frames)
        empty = str(tmp_path / "empty.iq")
        open(empty, "wb").close()
        out = str(tmp_path / "rf.iq")
        stats = sess.gateway_run_file(empty, out)
        assert stats["net_to_rf"] == len(frames)

        decoded = Session().rx_file(out)
        assert decoded["lsf"]["src"] == "M0ABC"
        assert decoded["lsf"]["dst"] == "BROADCAST"
        assert decoded["lsf"]["meta"] == meta.hex()


class TestGatewayLiveLoop:
    def test_continuous_rx_tx_interleaving(self, tmp_path):
        """The live DRTODN loop (m17_txrx_net_thread, m17_tx_rx.cpp:28-81):
        the UDP thread fills the jitter queue MID-SESSION while the RF
        side decodes, the loop keys up above the threshold, drains, and
        RETURNS to RX with more RF still to decode -- a true alternating
        state machine, not a one-pass batch (VERDICT round 2 missing #1).

        A fake reflector over real UDP sockets ACKs the CONN and, upon
        receiving the 3rd RF-originated voice datagram, answers with a
        20-frame net stream from a different originator -- so the key-up
        necessarily lands in the middle of the RF capture.
        """
        import threading
        import time

        from m17_sdr_tpu.io import reflector as refl
        from m17_sdr_tpu.runtime import UdpTransport

        # RF side: a 24-frame voice session from G4GUO
        rf_in = tmp_path / "rf_in.iq"
        payload_in = tmp_path / "voice.bin"
        rng = np.random.default_rng(7)
        payload_in.write_bytes(
            rng.integers(0, 256, (24, 16), dtype=np.uint8).tobytes())
        txdb = Session()
        txdb.db.tx_src_call = "G4GUO"
        txdb.tx_file(str(rf_in), payload_in=str(payload_in))

        # NET side: 20 frames originated by M0XYZ
        dst = bitpack.word_to_bytes(0xFFFFFFFFFFFF, 6)
        src = bitpack.word_to_bytes(cs.encode_callsign("M0XYZ"), 6)
        lich28 = bytes(dst) + bytes(src) + b"\x00\x05" + bytes(14)
        net_payloads = rng.integers(0, 256, (20, 16), dtype=np.uint8)

        refl_sock = UdpTransport("127.0.0.1", 42911, bind_port=42910)
        refl_sock.start_rx()
        seen_rf = []
        stop = threading.Event()

        def reflector_side():
            burst_sent = False
            while not stop.is_set():
                d = refl_sock.poll()
                if d is None:
                    time.sleep(0.005)
                    continue
                if d[:4] == b"CONN":
                    refl_sock.send(b"ACKN")
                elif d[:4] == b"M17 ":
                    vf = refl.parse_voice_frame(d)
                    if vf is not None:
                        seen_rf.append(vf)
                    if len(seen_rf) == 3 and not burst_sent:
                        burst_sent = True
                        for fn, pl in enumerate(net_payloads):
                            refl_sock.send(refl.pack_voice_frame(
                                0x4242, lich28, fn, pl.tobytes()))

        t = threading.Thread(target=reflector_side, daemon=True)
        t.start()

        sess = Session()
        sess.db.tx_src_call = "GATE1"
        sess.connect("127.0.0.1", "A", port=42910, bind_port=42911)
        rf_out = tmp_path / "rf_out.iq"
        try:
            stats = sess.gateway_run_live(str(rf_in), str(rf_out),
                                          chunk_blocks=3)
        finally:
            stop.set()
            t.join(timeout=5)
            sess.disconnect()
            refl_sock.close()

        # both directions moved
        assert stats["net_to_rf"] == 20, stats
        assert stats["rf_to_net"] >= 14, stats   # 24 minus LICH warm-up
        assert stats["keyups"] >= 1
        # the key-up interleaved: it happened BEFORE the RF side was
        # done (more rf frames were forwarded after the tx state)
        tx_events = [n for s, n in stats["events"] if s == "tx"]
        assert tx_events[0] < stats["rf_to_net"], stats["events"]
        # the reflector really received the RF stream from G4GUO
        assert all(cs.decode_callsign(vf.src).strip() == "G4GUO"
                   for vf in seen_rf)
        # and the RF output carries the NET originator's stream intact
        decoded = Session().rx_file(str(rf_out))
        assert decoded["lsf"]["src"] == "M0XYZ"
        out_payload = tmp_path / "net_rf.bin"
        decoded = Session().rx_file(str(rf_out),
                                    payload_out=str(out_payload))
        got = np.frombuffer(out_payload.read_bytes(),
                            np.uint8).reshape(-1, 16)
        sent_rows = [bytes(r) for r in net_payloads]
        assert got.shape[0] >= 19
        assert all(bytes(r) in sent_rows for r in got)
