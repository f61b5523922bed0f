"""maybe_initialize_distributed: env-var parsing + idempotency (VERDICT
round-2 item 10 — the multi-host entry point previously had zero
coverage). jax.distributed.initialize is stubbed so the tests exercise
the detection/parsing logic without a real coordinator."""

import pytest

import scae_tpu.parallel.mesh as mesh_mod


@pytest.fixture(autouse=True)
def _reset(monkeypatch):
    monkeypatch.setattr(mesh_mod, "_distributed_initialized", False)
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID", "SCAE_TPU_MULTIHOST"):
        monkeypatch.delenv(var, raising=False)
    yield


def _stub_initialize(monkeypatch, calls):
    def fake(**kwargs):
        calls.append(kwargs)
    monkeypatch.setattr(mesh_mod.jax.distributed, "initialize", fake)


def test_no_env_no_initialize(monkeypatch):
    calls = []
    _stub_initialize(monkeypatch, calls)
    assert mesh_mod.maybe_initialize_distributed() is False
    assert calls == []


def test_coordinator_env_parsed(monkeypatch):
    calls = []
    _stub_initialize(monkeypatch, calls)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    assert mesh_mod.maybe_initialize_distributed() is True
    assert calls == [{"coordinator_address": "10.0.0.1:1234",
                      "num_processes": 4, "process_id": 2}]


def test_coordinator_without_counts(monkeypatch):
    calls = []
    _stub_initialize(monkeypatch, calls)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "host:99")
    assert mesh_mod.maybe_initialize_distributed() is True
    assert calls == [{"coordinator_address": "host:99"}]


def test_multihost_optin_autodiscovery(monkeypatch):
    calls = []
    _stub_initialize(monkeypatch, calls)
    monkeypatch.setenv("SCAE_TPU_MULTIHOST", "1")
    assert mesh_mod.maybe_initialize_distributed() is True
    assert calls == [{}]  # pod auto-discovery: no explicit kwargs


def test_idempotent(monkeypatch):
    calls = []
    _stub_initialize(monkeypatch, calls)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "host:99")
    assert mesh_mod.maybe_initialize_distributed() is True
    assert mesh_mod.maybe_initialize_distributed() is True
    assert len(calls) == 1
