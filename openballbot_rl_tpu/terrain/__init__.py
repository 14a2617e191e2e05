"""Terrain generators; registered on import (mirrors ballbot_gym/terrain/__init__.py:18-36)."""
from openballbot_rl_tpu.core.registry import ComponentRegistry
from openballbot_rl_tpu.terrain.generators import (
    generate_bowl_terrain,
    generate_flat_terrain,
    generate_gradient_terrain,
    generate_hills_terrain,
    generate_mixed_terrain,
    generate_perlin_terrain,
    generate_ramp_terrain,
    generate_ridge_valley_terrain,
    generate_sinusoidal_terrain,
    generate_spiral_terrain,
    generate_stepped_terrain,
    generate_terraced_terrain,
    generate_wavy_terrain,
)

_ALL = {
    "perlin": generate_perlin_terrain,
    "stepped": generate_stepped_terrain,
    "ramp": generate_ramp_terrain,
    "sinusoidal": generate_sinusoidal_terrain,
    "ridge_valley": generate_ridge_valley_terrain,
    "hills": generate_hills_terrain,
    "bowl": generate_bowl_terrain,
    "gradient": generate_gradient_terrain,
    "terraced": generate_terraced_terrain,
    "wavy": generate_wavy_terrain,
    "spiral": generate_spiral_terrain,
    "mixed": generate_mixed_terrain,
    "flat": generate_flat_terrain,
}

for _name, _fn in _ALL.items():
    if _name not in ComponentRegistry.list_terrains():
        ComponentRegistry.register_terrain(_name, _fn)

__all__ = [f"generate_{n}_terrain" for n in _ALL]
