"""Manifests, watchdog, and packaging sanity."""

import time

import numpy as np

from stainlib_tpu.data.manifests import (
    read_manifest,
    split_manifest,
    write_manifest,
    write_split_manifests,
)
from stainlib_tpu.utils.watchdog import StallWatchdog


def test_manifest_round_trip(tmp_path):
    names = [f"patch_{i:03d}.png" for i in range(10)]
    p = write_manifest(str(tmp_path / "training_filenames.txt"), names)
    assert read_manifest(p) == names
    rooted = read_manifest(p, root="/data")
    assert rooted[0] == "/data/patch_000.png"


def test_split_manifest_deterministic(tmp_path):
    names = [f"s{i}" for i in range(100)]
    a = split_manifest(names, {"training": 0.6, "validation": 0.2,
                               "test": 0.2}, seed=7)
    b = split_manifest(names, {"training": 0.6, "validation": 0.2,
                               "test": 0.2}, seed=7)
    assert a == b
    assert len(a["training"]) == 60 and len(a["validation"]) == 20
    assert set(sum(a.values(), [])) == set(names)
    paths = write_split_manifests(str(tmp_path), a, prefix="tupac_")
    assert paths["training"].endswith("tupac_training_filenames.txt")
    assert read_manifest(paths["test"]) == a["test"]


def test_watchdog_fires_and_resets():
    events = []
    wd = StallWatchdog(timeout_s=0.15, poll_s=0.02,
                       on_stall=lambda gap: events.append(gap))
    with wd:
        wd.beat()
        time.sleep(0.35)  # stall -> one firing
        assert wd.stall_count == 1
        wd.beat()  # recovery re-arms
        time.sleep(0.35)
    assert wd.stall_count == 2
    assert len(events) == 2 and all(g >= 0.15 for g in events)


def test_watchdog_quiet_when_beating():
    wd = StallWatchdog(timeout_s=0.3, poll_s=0.02)
    with wd:
        for _ in range(10):
            wd.beat()
            time.sleep(0.03)
    assert wd.stall_count == 0
