"""Gate-window budget lint (ADVICE r11): the driver's correctness gate
samples the FIRST 50 registration-order queries not in
``registry._DRIVER_PROVEN``.  Query #51 would silently bump an existing
unproven query out of its driver sampling — the staleness hazard the
_REVERIFY rotation exists to prevent.  This test makes the budget a
hard assertion instead of a convention.

Pure-Python over the registry module — no SparkSession needed.
"""

from __future__ import annotations

GATE_WINDOW = 50


def _loaded_registry():
    from gmall_211027_flink_spark import registry

    registry.load_all()
    return registry


def test_unproven_count_fits_gate_window():
    """Every driver-unproven query (new + _REVERIFY) must fit in the
    50-name gate window, or one of them ships without driver proof."""
    registry = _loaded_registry()
    proven = set(registry._DRIVER_PROVEN)
    unproven = [n for n in registry.QUERIES if n not in proven]
    assert len(unproven) <= GATE_WINDOW, (
        f"{len(unproven)} driver-unproven queries exceed the "
        f"{GATE_WINDOW}-name gate window; promote gate-proven names "
        f"into registry._DRIVER_PROVEN (or shrink _REVERIFY) so every "
        f"unproven query is actually sampled: {unproven}")


def test_unproven_queries_register_first():
    """load_all() must put every unproven query at the head of the
    registration order (the gate samples the first 50)."""
    registry = _loaded_registry()
    proven = set(registry._DRIVER_PROVEN)
    names = list(registry.QUERIES)
    n_unproven = sum(1 for n in names if n not in proven)
    head = names[:n_unproven]
    stragglers = [n for n in head if n in proven]
    assert not stragglers, (
        f"proven names {stragglers} registered before unproven ones — "
        f"load_all()'s reordering is broken")


def test_reverify_disjoint_from_proven():
    """_REVERIFY names must be out of _DRIVER_PROVEN (they are the
    same-name rotation, not additions) and must all exist."""
    registry = _loaded_registry()
    overlap = set(registry._DRIVER_PROVEN) & set(registry._REVERIFY)
    assert not overlap
    missing = [n for n in registry._REVERIFY if n not in registry.QUERIES]
    assert not missing, f"_REVERIFY names not registered: {missing}"


def test_proven_names_all_registered():
    """A _DRIVER_PROVEN name that no module registers any more is a
    silent registry hole (rename/delete without bookkeeping)."""
    registry = _loaded_registry()
    missing = [n for n in registry._DRIVER_PROVEN
               if n not in registry.QUERIES]
    assert not missing, f"_DRIVER_PROVEN names not registered: {missing}"
