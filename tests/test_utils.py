"""Config + profiling utilities."""

import os

from thaler_study_tpu.utils import COUNTS, FrameworkConfig, RoundTimer


def test_config_defaults_and_env(monkeypatch):
    cfg = FrameworkConfig()
    assert cfg.field.name == "Goldilocks"
    monkeypatch.setenv("THALER_FIELD", "babybear")
    monkeypatch.setenv("THALER_SHARD_VARS", "4")
    cfg = FrameworkConfig.from_env()
    assert cfg.field.name == "BabyBear"
    assert cfg.shard_vars == 4


def test_round_timer_tracks_counters():
    timer = RoundTimer()
    with timer.round("r0"):
        COUNTS.field_muls += 100
        COUNTS.field_adds += 50
    s = timer.summary()
    assert s["rounds"] == 1
    assert s["field_muls"] == 100 and s["field_adds"] == 50
    assert s["field_ops_per_s"] > 0
