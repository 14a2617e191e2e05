"""Registry tests (mirror of reference tests/unit/test_registry.py:12-83)."""
import pytest

from openballbot_rl_tpu.core.registry import ComponentRegistry


@pytest.fixture
def scratch_registry():
    """Save and restore registry contents around a test that clears it."""
    saved = (dict(ComponentRegistry._rewards), dict(ComponentRegistry._terrains),
             dict(ComponentRegistry._policies), dict(ComponentRegistry._sensors))
    ComponentRegistry.clear()
    yield ComponentRegistry
    ComponentRegistry.clear()
    ComponentRegistry._rewards.update(saved[0])
    ComponentRegistry._terrains.update(saved[1])
    ComponentRegistry._policies.update(saved[2])
    ComponentRegistry._sensors.update(saved[3])


def test_register_and_get_reward(scratch_registry):
    class Dummy:
        def __init__(self, x=1):
            self.x = x

    scratch_registry.register_reward("dummy", Dummy)
    r = scratch_registry.get_reward("dummy", x=5)
    assert isinstance(r, Dummy) and r.x == 5
    assert scratch_registry.list_rewards() == ["dummy"]


def test_duplicate_registration_raises(scratch_registry):
    scratch_registry.register_terrain("t", lambda n, **k: None)
    with pytest.raises(ValueError, match="already registered"):
        scratch_registry.register_terrain("t", lambda n, **k: None)


def test_unknown_name_raises(scratch_registry):
    with pytest.raises(ValueError, match="Unknown terrain"):
        scratch_registry.get_terrain("nope")
    with pytest.raises(ValueError, match="Unknown reward"):
        scratch_registry.get_reward("nope")


def test_invalid_name_and_type(scratch_registry):
    with pytest.raises(ValueError):
        scratch_registry.register_reward("", lambda: None)
    with pytest.raises(TypeError):
        scratch_registry.register_reward("x", 42)


def test_clear(scratch_registry):
    scratch_registry.register_policy("p", object)
    scratch_registry.clear()
    assert scratch_registry.list_policies() == []


def test_default_components_registered():
    """Importing the packages registers the standard component set."""
    import openballbot_rl_tpu.rewards  # noqa: F401
    import openballbot_rl_tpu.terrain  # noqa: F401

    assert "directional" in ComponentRegistry.list_rewards()
    assert "distance" in ComponentRegistry.list_rewards()
    terrains = ComponentRegistry.list_terrains()
    for name in ["perlin", "flat", "stepped", "ramp", "sinusoidal",
                 "ridge_valley", "hills", "bowl", "gradient", "terraced",
                 "wavy", "spiral", "mixed"]:
        assert name in terrains, name
    assert len(terrains) == 13
