#!/bin/bash
# Install the framework (reference: scripts/setup/install.sh — but no
# patched-MuJoCo build step: the physics engine is part of the package).
set -e
cd "$(dirname "$0")/../.."
pip install -e . --no-deps --no-build-isolation
python scripts/setup/verify_installation.py
