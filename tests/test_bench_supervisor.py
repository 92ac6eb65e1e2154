"""bench.py supervisor: survive a hung/crashed relay child.

The axon relay can hang any python child at interpreter startup (the
sitecustomize dials it before user code runs) or mid-run, and the hung RPC
does not release the GIL — so bench.py runs its measurement in a child
process and the parent watches stderr activity. These tests drive
``bench._supervise`` against stub children that hang, crash, or succeed,
without ever touching jax.
"""

import json
import sys
import textwrap

import bench


def _write_child(tmp_path, body: str) -> str:
    p = tmp_path / "fake_bench.py"
    p.write_text(textwrap.dedent(body))
    return str(p)


def _run_supervise(monkeypatch, script: str, stall: str = "2") -> int:
    monkeypatch.setattr(sys, "argv", [script])
    monkeypatch.setenv("SS_ASR_BENCH_STALL_S", stall)
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.delenv(bench._CHILD_ENV, raising=False)
    monkeypatch.delenv(bench._FELL_BACK_ENV, raising=False)
    return bench._supervise()


def test_hung_child_falls_back_to_cpu(tmp_path, monkeypatch, capfd):
    script = _write_child(tmp_path, f'''
        import json, os, sys, time
        if os.environ.get("JAX_PLATFORMS") == "cpu":
            # the fallback child must carry the marker and must not be able
            # to redial the relay at startup
            assert os.environ.get("{bench._FELL_BACK_ENV}") == "1"
            assert "PALLAS_AXON_POOL_IPS" not in os.environ
            print(json.dumps({{"metric": "m", "value": 1.0}}))
            sys.exit(0)
        time.sleep(600)  # simulated relay hang: silent forever
    ''')
    rc = _run_supervise(monkeypatch, script)
    out, err = capfd.readouterr()
    assert rc == 0
    assert json.loads(out)["value"] == 1.0
    assert "killing it" in err
    assert "re-running bench on cpu" in err


def test_crashed_child_falls_back_to_cpu(tmp_path, monkeypatch, capfd):
    script = _write_child(tmp_path, '''
        import json, os, sys
        if os.environ.get("JAX_PLATFORMS") == "cpu":
            print(json.dumps({"metric": "m", "value": 2.0}))
            sys.exit(0)
        print("boom at startup", file=sys.stderr)
        sys.exit(3)
    ''')
    rc = _run_supervise(monkeypatch, script)
    out, err = capfd.readouterr()
    assert rc == 0
    assert json.loads(out)["value"] == 2.0
    assert "boom at startup" in err  # child stderr is forwarded live
    assert "rc=3" in err


def test_transient_hang_recovers_on_relay_retry(tmp_path, monkeypatch, capfd):
    """A one-off hang (slow compile / dropped tunnel) must get a second
    relay attempt before any CPU fallback — a fallback-marked artifact
    costs the round its TPU headline."""
    marker = tmp_path / "first_attempt_done"
    script = _write_child(tmp_path, f'''
        import json, os, sys, time
        assert os.environ.get("JAX_PLATFORMS") != "cpu", "fell back too early"
        if not os.path.exists({str(marker)!r}):
            open({str(marker)!r}, "w").close()
            time.sleep(600)  # first attempt: silent hang
        print(json.dumps({{"metric": "m", "value": 4.0}}))
    ''')
    rc = _run_supervise(monkeypatch, script)
    out, err = capfd.readouterr()
    assert rc == 0
    assert json.loads(out)["value"] == 4.0
    assert "retrying once on the relay" in err
    assert "re-running bench on cpu" not in err


def test_both_attempts_failing_emits_error_artifact(tmp_path, monkeypatch,
                                                    capfd):
    script = _write_child(tmp_path, '''
        import sys
        sys.exit(1)
    ''')
    rc = _run_supervise(monkeypatch, script)
    out, _ = capfd.readouterr()
    assert rc == 1
    artifact = json.loads(out)
    assert artifact["value"] == 0.0
    assert "error" in artifact


def test_healthy_child_passes_straight_through(tmp_path, monkeypatch, capfd):
    script = _write_child(tmp_path, f'''
        import json, os, sys
        assert os.environ.get("{bench._CHILD_ENV}") == "1"
        assert os.environ.get("{bench._FELL_BACK_ENV}") is None
        print("measuring", file=sys.stderr)
        print(json.dumps({{"metric": "m", "value": 3.0}}))
    ''')
    rc = _run_supervise(monkeypatch, script)
    out, err = capfd.readouterr()
    assert rc == 0
    assert json.loads(out)["value"] == 3.0
    assert "measuring" in err
    assert "re-running" not in err
