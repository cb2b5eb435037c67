"""bench.py TPU-probe hardening (VERDICT r3 Missing #1 / Weak #2).

The probe's platform parsing must survive plugin noise on stdout: the round-3
parser took the last whitespace token of the whole stream, so any plugin that
printed to stdout after the platform line would shift the token and make the
bench self-reject against a *live* TPU. The sentinel-delimited parser is
pinned here against noisy fixtures, and the dead-tunnel failure record is
pinned to carry value=null (not 0.0) plus the last-verified measurement.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

S = bench.PROBE_SENTINEL


class TestParseProbePlatform:
    def test_clean(self):
        assert bench.parse_probe_platform(f"{S}=TPU v5e={S}\n") == "TPU v5e"

    def test_plugin_noise_before_and_after(self):
        out = (
            "WARNING: All log messages before absl::InitializeLog()\n"
            "libtpu plugin loaded, version 0.0.17\n"
            f"{S}=tpu={S}\n"
            "I0000 00:00 profiler server started on port 9999\n"
        )
        assert bench.parse_probe_platform(out) == "tpu"

    def test_noise_on_same_line(self):
        # a plugin writing without a trailing newline can glue its output
        # onto the sentinel line; the parser keys on the markers, not the
        # line boundaries.
        out = f"[plugin] ready {S}=axon={S} trailing junk\n"
        assert bench.parse_probe_platform(out) == "axon"

    def test_empty_and_garbage(self):
        assert bench.parse_probe_platform("") == ""
        assert bench.parse_probe_platform("cpu\n") == ""
        assert bench.parse_probe_platform(f"{S}=unterminated\n") == ""

    def test_cpu_fallback_still_rejected(self):
        # the sentinel must not hide a silent CPU fallback: the platform
        # token it extracts is what the cpu/gpu reject-list checks.
        assert bench.parse_probe_platform(f"{S}=cpu={S}\n") == "cpu"

    def test_child_src_emits_parseable_line(self):
        # run the actual probe child source with a stubbed jax: whatever
        # bench sends to the subprocess must round-trip through the parser.
        code = (
            "import sys, types\n"
            "jax = types.ModuleType('jax')\n"
            "jax.devices = lambda: [types.SimpleNamespace(platform='tpu')]\n"
            "sys.modules['jax'] = jax\n"
            + bench.PROBE_CHILD_SRC
        )
        res = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True
        )
        assert res.returncode == 0, res.stderr
        assert bench.parse_probe_platform(res.stdout) == "tpu"


class TestRelayPreProbe:
    def test_no_opinion_off_axon(self, monkeypatch):
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        assert bench.relay_ports_open() is None
        monkeypatch.delenv("JAX_PLATFORMS", raising=False)
        assert bench.relay_ports_open() is None

    def test_refused_ports_fail_fast(self, monkeypatch):
        monkeypatch.setenv("JAX_PLATFORMS", "axon")
        # on the TPU host a LIVE relay legitimately serves these ports —
        # the refused-port behavior is only observable when nothing listens
        import socket

        for port in (8082, 8083, 8087):
            s = socket.socket()
            s.settimeout(0.5)
            try:
                s.connect(("127.0.0.1", port))
            except OSError:
                continue
            else:
                pytest.skip("live relay on the probe ports; refusal "
                            "behavior not observable here")
            finally:
                s.close()
        assert bench.relay_ports_open() is False

    def test_open_port_detected(self, monkeypatch):
        import socket
        import threading

        monkeypatch.setenv("JAX_PLATFORMS", "axon")
        srv = socket.socket()
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        try:
            srv.bind(("127.0.0.1", 8082))
        except OSError:
            # port taken by a real relay — then open detection is live
            assert bench.relay_ports_open() is True
            return
        srv.listen(1)

        def _accept_quietly():
            try:
                srv.accept()
            except OSError:
                pass  # server socket closed by the test teardown

        t = threading.Thread(target=_accept_quietly, daemon=True)
        t.start()
        try:
            assert bench.relay_ports_open() is True
        finally:
            srv.close()


class TestFailureRecord:
    def test_dead_tunnel_record_is_null_not_zero(self, monkeypatch, capsys):
        monkeypatch.setattr(bench, "tpu_reachable", lambda: False)
        try:
            bench.main()
        except SystemExit as e:
            assert e.code == 1
        rec = json.loads(capsys.readouterr().out.strip())
        assert rec["value"] is None
        assert rec["vs_baseline"] is None
        assert "error" in rec
        lv = rec["last_verified"]
        # The record must carry the standing verified claim verbatim; the
        # literal values live in bench.LAST_VERIFIED and move each time a
        # live run is recorded, so pin structure + sanity, not the number.
        assert lv == bench.LAST_VERIFIED
        assert lv["round"] >= 2 and lv["value"] >= 10000
        # round-4 review item: the standing claim must be an auditable
        # driver-captured number, and say so
        assert "driver" in lv["provenance"]


class TestLiveRecordSchema:
    def test_json_line_carries_self_audit_fields(self, monkeypatch, capsys):
        """The success record must carry the round-5 self-audit fields:
        warmup_s, compile-cache activity, per-precision serving rates, and
        the scan-epoch train throughput — so perf/cache regressions in any
        of them are driver-visible, not stderr-only."""
        monkeypatch.setattr(bench, "tpu_reachable", lambda: True)
        util = {"achieved_tflops": 16.5, "mfu": 0.084, "mfu_effective": 0.5}
        # the record's new_entries is refreshed in main() AFTER the train
        # bench (its program compiles there too); mock the final count
        monkeypatch.setattr(bench, "_cache_entries", lambda: 3000)
        monkeypatch.setattr(
            bench, "bench_tpu",
            lambda: (
                10861.1,
                util,
                123.4,
                {"tensorfloat32": 14566.5, "bfloat16": 14885.0},
                {"entries_before": 3000, "new_entries": 0},
                lambda q, s: (q, s, util),  # late_window passthrough
            ),
        )
        monkeypatch.setattr(
            bench, "bench_train_scan", lambda: (147.8, 32, 128)
        )
        monkeypatch.setattr(bench, "bench_reference_cpu", lambda: 32.6)
        bench.main()
        rec = json.loads(capsys.readouterr().out.strip())
        assert rec["value"] == 10861.1
        assert rec["warmup_s"] == 123.4
        assert rec["compile_cache"] == {
            "entries_before": 3000, "new_entries": 0,
        }
        assert rec["tensorfloat32_qps"] == 14566.5
        assert rec["bfloat16_qps"] == 14885.0
        assert rec["train_steps_per_sec"] == 147.8
        assert rec["train_batch"] == 32 and rec["train_scan_k"] == 128

    def test_cache_audit_covers_the_train_compile(self, monkeypatch, capsys):
        """new_entries must be recomputed in main() AFTER bench_train_scan:
        the train program's cache key moves with scan_steps / the dropout
        PRNG, and a count snapshotted at the end of bench_tpu() would print
        'fully warm' while a fresh train compile happened."""
        monkeypatch.setattr(bench, "tpu_reachable", lambda: True)
        util = {"achieved_tflops": 16.5, "mfu": 0.084, "mfu_effective": 0.5}
        monkeypatch.setattr(
            bench, "bench_tpu",
            lambda: (
                10861.1, util, 123.4, {},
                {"entries_before": 3000, "new_entries": 0},  # pre-train view
                lambda q, s: (q, s, util),
            ),
        )
        # the train bench wrote 2 fresh entries; main() reads the final count
        monkeypatch.setattr(bench, "_cache_entries", lambda: 3002)
        monkeypatch.setattr(
            bench, "bench_train_scan", lambda: (150.8, 32, 128)
        )
        monkeypatch.setattr(bench, "bench_reference_cpu", lambda: 33.9)
        bench.main()
        rec = json.loads(capsys.readouterr().out.strip())
        assert rec["compile_cache"] == {
            "entries_before": 3000, "new_entries": 2,
        }

    def test_train_measurement_failure_keeps_headline(
        self, monkeypatch, capsys
    ):
        """A broken train-throughput probe must null its field, never take
        down the headline eval record."""
        monkeypatch.setattr(bench, "tpu_reachable", lambda: True)
        util = {"achieved_tflops": 16.5, "mfu": 0.084, "mfu_effective": 0.5}
        monkeypatch.setattr(
            bench, "bench_tpu",
            lambda: (10861.1, util, 99.0, {}, {},
                     lambda q, s: (q, s, util)),
        )

        def boom():
            raise RuntimeError("scan compile failed")

        monkeypatch.setattr(bench, "bench_train_scan", boom)
        monkeypatch.setattr(bench, "bench_reference_cpu", lambda: 32.6)
        bench.main()
        rec = json.loads(capsys.readouterr().out.strip())
        assert rec["value"] == 10861.1
        assert rec["train_steps_per_sec"] is None

    def test_late_window_rescues_a_congested_record(
        self, monkeypatch, capsys
    ):
        """If the early interleaved windows all landed in a service-
        congestion burst, the post-train late window's better readings
        must replace the headline AND side fields (observed on-chip:
        whole-run eval depression while train minutes later ran at full
        speed)."""
        monkeypatch.setattr(bench, "tpu_reachable", lambda: True)
        monkeypatch.setattr(bench, "_cache_entries", lambda: 4088)
        lo = {"achieved_tflops": 15.8, "mfu": 0.080, "mfu_effective": 0.66}
        hi = {"achieved_tflops": 16.5, "mfu": 0.084, "mfu_effective": 0.69}

        def late(q, s):
            return 10874.2, {**s, "bfloat16": 15605.3}, hi

        monkeypatch.setattr(
            bench, "bench_tpu",
            lambda: (
                10405.8, lo, 465.6,
                {"tensorfloat32": 10794.6, "bfloat16": 11879.0},
                {"entries_before": 4088, "new_entries": 0},
                late,
            ),
        )
        monkeypatch.setattr(
            bench, "bench_train_scan", lambda: (150.3, 32, 128)
        )
        monkeypatch.setattr(bench, "bench_reference_cpu", lambda: 31.8)
        bench.main()
        rec = json.loads(capsys.readouterr().out.strip())
        assert rec["value"] == 10874.2
        assert rec["bfloat16_qps"] == 15605.3
        assert rec["mfu_effective"] == 0.69
