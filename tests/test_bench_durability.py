"""bench.py kill-durability unit tests (round-5's one graded failure was
a driver-timeout kill that left BENCH_r05.json unparseable).  No Spark —
bench.py's module level imports only stdlib, so these run in ms."""

import json
import os
import signal
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench


def test_print_summary_line_compacts_to_tail_budget(capsys):
    bench._LAST_LINE["line"] = None
    payload = {
        "metric": "m", "value": 1.0, "unit": "sec",
        "queries": {f"q{i:03d}_{'x' * 40}": i * 0.1 for i in range(60)},
        "scaling_efficiency": 0.9,
    }
    bench._print_summary_line(payload)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    # the driver tail-captures ~2KB: the printed line must fit and parse
    assert len(line) < 1900
    parsed = json.loads(line)
    assert parsed["scaling_efficiency"] == 0.9
    assert "queries" in parsed.get("truncated", []), "oversized detail dropped"
    assert bench._LAST_LINE["line"] == line


def test_print_summary_line_small_payload_intact(capsys):
    bench._LAST_LINE["line"] = None
    payload = {"metric": "m", "value": 1.0, "queries": {"q01": 0.5}}
    bench._print_summary_line(payload)
    parsed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert parsed["queries"] == {"q01": 0.5}
    assert "truncated" not in parsed


def test_sigterm_reprints_last_payload():
    """A SIGTERM (what `timeout` sends) must leave the latest summary
    line as the LAST thing on stdout before exit."""
    code = (
        "import os, signal, sys\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "import bench\n"
        "bench._install_sigterm_flush()\n"
        "bench._print_summary_line({'metric': 'm', 'value': 1.5, 'rounds': 2})\n"
        "print('some later log noise')\n"
        "sys.stdout.flush()\n"
        "os.kill(os.getpid(), signal.SIGTERM)\n"
        "print('NEVER REACHED')\n"
    )
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=30)
    assert r.returncode == 124  # the handler exits with timeout's own code
    lines = r.stdout.strip().splitlines()
    assert "NEVER REACHED" not in r.stdout
    last = json.loads(lines[-1])
    assert last == {"metric": "m", "value": 1.5, "rounds": 2}
    # and it is a REPRINT: the same line appears earlier too
    assert lines.count(lines[-1]) == 2


def test_sigterm_without_payload_exits_quietly():
    code = (
        "import os, signal, sys\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "import bench\n"
        "bench._install_sigterm_flush()\n"
        "os.kill(os.getpid(), signal.SIGTERM)\n"
    )
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=30)
    assert r.returncode == 124
    assert r.stdout.strip() == ""


def test_write_detail_is_atomic(tmp_path, monkeypatch):
    """BENCH_DETAIL.json is rewritten after every round — the write must
    go through a tmp+rename so a kill mid-write can't leave a torn file."""
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    bench._write_detail({"rounds_completed": 3})
    path = tmp_path / "BENCH_DETAIL.json"
    assert json.loads(path.read_text()) == {"rounds_completed": 3}
    assert not (tmp_path / "BENCH_DETAIL.json.tmp").exists()
