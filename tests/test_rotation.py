"""Rotation-policy unit tests (scripts/gen_priority.py).

The driver samples the FIRST 50 of registry.ordered() per round, so
the generated priority IS the correctness-rotation policy. These
tests pin the r10 addition (VERDICT r9 item 1): a query whose oracle
was ADDED or EDITED since its last official row must be front-loaded
(beside never-green failures) instead of waiting out the vintage
queue — detected via the latest official row's ``no_oracle`` marker
and the sha256 sidecar in scripts/oracle_state.json.
"""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_gen_priority():
    spec = importlib.util.spec_from_file_location(
        "gen_priority", os.path.join(REPO, "scripts", "gen_priority.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_registry(monkeypatch, queries, oracles):
    from flight_data_pipeline_spark.plans import registry

    monkeypatch.setattr(registry, "QUERIES",
                        {n: (lambda s, d: None) for n in queries})
    monkeypatch.setattr(registry, "ORACLE_SQL", oracles)


GREEN = {"err": None, "hash_match": True}
ROWS_ONLY = {"err": "no_oracle", "hash_match": None}


class TestOracleChangeDetection:
    def test_rows_only_to_oracle_is_front_loaded(self, monkeypatch,
                                                 tmp_path):
        """A query whose latest official row is rows-only but which
        now carries an oracle has never had that oracle officially
        verified — it must surface as changed."""
        gp = _load_gen_priority()
        monkeypatch.setattr(gp, "ORACLE_STATE",
                            str(tmp_path / "state.json"))
        _fake_registry(monkeypatch,
                       ["promoted", "plain_green", "still_rows_only"],
                       {"promoted": "SELECT 1",
                        "plain_green": "SELECT 2"})
        rounds = {
            1: {"promoted": dict(ROWS_ONLY),
                "plain_green": dict(GREEN),
                "still_rows_only": dict(ROWS_ONLY)},
        }
        changed = gp.oracle_changed(rounds)
        assert changed == {"promoted"}
        # the sidecar records what each official row VERIFIED: the
        # hash-green its oracle sha, the rows-only rows None — so the
        # promoted query stays flagged until a new official green
        state = json.load(open(str(tmp_path / "state.json")))
        assert state["plain_green"]["sha"] is not None
        assert state["promoted"]["sha"] is None
        assert state["still_rows_only"]["sha"] is None
        # idempotent: re-running without a new round keeps the flag
        assert gp.oracle_changed(rounds) == {"promoted"}

    def test_oracle_edit_detected_via_sidecar(self, monkeypatch,
                                              tmp_path):
        """Once a green hash row records an oracle sha, editing the
        oracle SQL flags the query until a new official green lands."""
        gp = _load_gen_priority()
        monkeypatch.setattr(gp, "ORACLE_STATE",
                            str(tmp_path / "state.json"))
        _fake_registry(monkeypatch, ["q"], {"q": "SELECT 1"})
        rounds = {3: {"q": dict(GREEN)}}
        assert gp.oracle_changed(rounds) == set()  # baseline recorded

        _fake_registry(monkeypatch, ["q"], {"q": "SELECT 1 -- edited"})
        assert gp.oracle_changed(rounds) == {"q"}
        # the sidecar must NOT silently adopt the unverified edit
        assert gp.oracle_changed(rounds) == {"q"}

        # a fresh official green on the edited oracle clears the flag
        rounds[4] = {"q": dict(GREEN)}
        assert gp.oracle_changed(rounds) == set()

    def test_never_sampled_is_not_changed(self, monkeypatch, tmp_path):
        gp = _load_gen_priority()
        monkeypatch.setattr(gp, "ORACLE_STATE",
                            str(tmp_path / "state.json"))
        _fake_registry(monkeypatch, ["newq"], {"newq": "SELECT 1"})
        assert gp.oracle_changed({1: {}}) == set()


class TestRepoRotationState:
    def test_pending_oracle_changes_sit_in_the_driver_window(self):
        """Invariant of the committed state: any query whose sidecar
        sha mismatches the registry's CURRENT oracle is a pending
        promotion/edit, and the rotation policy's whole point is that
        it must sit inside the driver's 50-query sample window (a
        mismatch OUTSIDE the window means gen_priority wasn't re-run
        after an oracle edit)."""
        gp = _load_gen_priority()
        from flight_data_pipeline_spark.plans import registry

        registry.load_all()
        if not os.path.exists(gp.ORACLE_STATE):
            return
        state = json.load(open(gp.ORACLE_STATE))
        window = list(registry.ordered())[:50]
        for name, rec in state.items():
            if name not in registry.QUERIES:
                continue  # deregistered query: stale entry is inert
            if rec["sha"] != gp._oracle_sha(name):
                assert name in window, (
                    f"{name}: oracle changed since its official "
                    "baseline but is NOT in the driver window — run "
                    "scripts/gen_priority.py and re-gate")
