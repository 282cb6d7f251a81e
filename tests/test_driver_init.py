"""Driver bootstrap contract (cdc/_driver.py): local mode owns a
sized session; under `ray job submit` (RAY_ADDRESS exported to a real
cluster address) the entry point must JOIN that cluster and must NOT
pass the local-mode num_cpus knob."""

from unittest import mock

from ton_etl_ray.cdc._driver import init_driver


def _run(monkeypatch, addr_env):
    import ray

    calls = {}

    def fake_init(**kw):
        calls.update(kw)

    if addr_env is None:
        monkeypatch.delenv("RAY_ADDRESS", raising=False)
    else:
        monkeypatch.setenv("RAY_ADDRESS", addr_env)
    with mock.patch.object(ray, "is_initialized", return_value=False), \
         mock.patch.object(ray, "init", side_effect=fake_init):
        init_driver(num_cpus=8)
    return calls


def test_local_mode_owns_a_sized_session(monkeypatch):
    calls = _run(monkeypatch, "local")
    assert calls["address"] == "local"
    assert calls["num_cpus"] == 8


def test_unset_address_defaults_to_local(monkeypatch):
    calls = _run(monkeypatch, None)
    assert calls["address"] == "local"


def test_empty_address_is_treated_as_unset(monkeypatch):
    # Ray's own convention: RAY_ADDRESS="" means unset, not a cluster
    calls = _run(monkeypatch, "")
    assert calls["address"] == "local"
    assert calls["num_cpus"] == 8


def test_cluster_address_joins_without_num_cpus(monkeypatch):
    calls = _run(monkeypatch, "127.0.0.1:6400")
    assert calls["address"] == "127.0.0.1:6400"
    # the cluster defines its own resource pool
    assert "num_cpus" not in calls
