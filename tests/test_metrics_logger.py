"""MetricsLogger's layered wandb path (reference funnels everything through wandb_log with
an init retry wrapper, reference src/utils.py:311-325; here JSONL is the source of truth
and wandb is a bounded-retry optional layer). wandb is absent from this image, so the
tests exercise the layer with a stub module injected into sys.modules."""

import json
import sys
import types


def _stub_wandb(fail_inits: int):
    """A wandb lookalike whose init fails ``fail_inits`` times, then succeeds."""
    mod = types.ModuleType("wandb")
    mod.calls = {"init": 0, "log": []}

    def init(**kwargs):
        mod.calls["init"] += 1
        if mod.calls["init"] <= fail_inits:
            raise RuntimeError(f"simulated wandb outage #{mod.calls['init']}")
        mod.calls["init_kwargs"] = kwargs

    def log(row):
        mod.calls["log"].append(row)

    mod.init = init
    mod.log = log
    return mod


def _run(tmp_path, fail_inits: int):
    from diamond_tpu.utils import MetricsLogger

    stub = _stub_wandb(fail_inits)
    old = sys.modules.get("wandb")
    sys.modules["wandb"] = stub
    try:
        logger = MetricsLogger(tmp_path / "metrics.jsonl",
                               {"mode": "online", "project": "p", "name": "n"})
        logger.log([{"a": 1.0}, {"b": 2.0}], epoch=3)
    finally:
        if old is None:
            sys.modules.pop("wandb", None)
        else:
            sys.modules["wandb"] = old
    rows = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    return stub, rows


def test_wandb_layer_forwards_rows(tmp_path):
    stub, rows = _run(tmp_path, fail_inits=0)
    assert stub.calls["init"] == 1
    assert stub.calls["init_kwargs"] == {"project": "p", "name": "n", "resume": True}
    assert [r["epoch"] for r in rows] == [3, 3]
    assert stub.calls["log"] == rows  # every JSONL row mirrored to wandb


def test_wandb_init_retries_then_succeeds(tmp_path):
    stub, rows = _run(tmp_path, fail_inits=2)  # fails twice, third attempt lands
    assert stub.calls["init"] == 3
    assert len(stub.calls["log"]) == 2


def test_wandb_init_failure_degrades_to_jsonl_only(tmp_path, capsys):
    stub, rows = _run(tmp_path, fail_inits=99)
    from diamond_tpu.utils import MetricsLogger

    assert stub.calls["init"] == MetricsLogger.WANDB_INIT_RETRIES
    assert stub.calls["log"] == []          # wandb never received anything
    assert [r["epoch"] for r in rows] == [3, 3]  # but JSONL is intact
    assert "JSONL only" in capsys.readouterr().out


def test_wandb_disabled_mode_never_imports(tmp_path):
    from diamond_tpu.utils import MetricsLogger

    assert "wandb" not in sys.modules or not hasattr(sys.modules["wandb"], "calls")
    logger = MetricsLogger(tmp_path / "m.jsonl", {"mode": "disabled", "project": "p"})
    logger.log([{"x": 1}], epoch=0)
    assert logger._wandb is None
