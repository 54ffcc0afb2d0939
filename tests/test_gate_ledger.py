"""Gate-rotation ledger invariants (VERDICT r7 item 7).

The driver's correctness gate holds at most 50 slots per round; slots
rotate so every registered query eventually gets an independent driver
rows+schema+hash row. GATE_LEDGER records which rounds each query held a
slot. These tests make the rotation computable (and auditable) from the
repo alone:

  (a) ledger keys == REGISTRY keys, and every query has held >= 1 slot
      (the round-8 rotation cleared the never-gated backlog);
  (b) a query's ledger contains the CURRENT round iff it is GATED —
      so GATED ∪ {rotated-out} == REGISTRY with no orphans;
  (c) past rounds match the committed CORRECTNESS_r*.json driver
      artifacts exactly (no aspirational history);
  (d) since round 9 the ledger module is GENERATED
      (scripts/gen_gate_ledger.py) — the committed module must
      regenerate byte-identically, so the derivation IS the record.
"""

from __future__ import annotations

import json
import os

import pytest

from petasearch_spark.registry import GATE_LEDGER, GATED, REGISTRY, UNGATED

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CURRENT_ROUND = 9


def test_ledger_covers_registry_exactly():
    from petasearch_spark.registry import PENDING_FIRST_GATE

    assert set(GATE_LEDGER) == set(REGISTRY)
    never = [k for k, rounds in GATE_LEDGER.items() if not rounds]
    # queries registered after the current round's rotation settled are
    # the only permitted never-gated names, and they must be explicitly
    # queued for the next rotation
    assert set(never) <= set(PENDING_FIRST_GATE), (
        f"queries with no lifetime gate slot and no PENDING_FIRST_GATE entry: "
        f"{sorted(set(never) - set(PENDING_FIRST_GATE))}"
    )
    for name, added_round in PENDING_FIRST_GATE.items():
        assert name in REGISTRY
        assert added_round >= CURRENT_ROUND, (
            f"{name} was queued in round {added_round} but never rotated in "
            f"by round {CURRENT_ROUND} — PENDING_FIRST_GATE debts are due at "
            f"the next rotation"
        )


def test_ledger_current_round_matches_gated():
    for name, rounds in GATE_LEDGER.items():
        if name in GATED:
            assert CURRENT_ROUND in rounds, f"{name} gated but not in ledger r{CURRENT_ROUND}"
        else:
            assert CURRENT_ROUND not in rounds, f"{name} ungated but ledger claims r{CURRENT_ROUND}"
    assert set(GATED) | set(UNGATED) == set(REGISTRY)
    assert not set(GATED) & set(UNGATED)


def test_ledger_rounds_sorted_and_in_range():
    for name, rounds in GATE_LEDGER.items():
        assert rounds == sorted(rounds), name
        assert len(set(rounds)) == len(rounds), name
        assert all(1 <= r <= CURRENT_ROUND for r in rounds), name


@pytest.mark.parametrize("round_no", range(1, CURRENT_ROUND))
def test_ledger_matches_committed_driver_artifacts(round_no):
    path = os.path.join(REPO, f"CORRECTNESS_r{round_no:02d}.json")
    if not os.path.exists(path):
        pytest.skip(f"driver artifact for round {round_no} not committed")
    with open(path) as fh:
        driver_keys = set(json.load(fh))
    ledger_keys = {k for k, rounds in GATE_LEDGER.items() if round_no in rounds}
    assert ledger_keys == driver_keys, (
        f"round {round_no}: ledger∖driver={sorted(ledger_keys - driver_keys)}"
        f" driver∖ledger={sorted(driver_keys - ledger_keys)}"
    )


def test_flagship_search_family_stays_gated():
    for name in ("protein_search", "protein_search_masked", "protein_prefilter"):
        assert name in GATED, f"flagship {name} must keep its gate slot"


def test_ledger_module_regenerates_byte_identical():
    """VERDICT r8 item 5: the ledger is derived, not hand-maintained — a
    rotation edit in registry.py without a gen_gate_ledger.py rerun (or a
    hand edit of the generated module) fails here, not in the audit."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_gate_ledger", os.path.join(REPO, "scripts", "gen_gate_ledger.py")
    )
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    with open(os.path.join(REPO, "petasearch_spark", "gate_ledger.py")) as fh:
        committed = fh.read()
    assert committed == gen.generate(), (
        "petasearch_spark/gate_ledger.py is stale — rerun scripts/gen_gate_ledger.py"
    )
