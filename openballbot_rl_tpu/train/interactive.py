"""Interactive confirmation prompt (reference:
ballbot_rl/training/interactive.py:4-15).

Non-interactive sessions (pipes, CI, cron) auto-confirm so batch training
never blocks on a prompt.
"""
from __future__ import annotations

import sys


def confirm(prompt: str, default: bool = False,
            assume_yes: bool = False) -> bool:
    """y/N prompt loop; returns the user's choice.

    assume_yes or a non-tty stdin short-circuits to True (the reference
    blocks forever in that case — conscious fix)."""
    if assume_yes or not sys.stdin.isatty():
        return True
    suffix = " [Y/n] " if default else " [y/N] "
    while True:
        raw = input(prompt + suffix).strip().lower()
        if not raw:
            return default
        if raw in ("y", "yes"):
            return True
        if raw in ("n", "no"):
            return False
        print("please answer y or n")
