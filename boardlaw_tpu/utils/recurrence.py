"""Recurrent-state plumbing for stateful models.

Reference counterpart: rebar/recurrence.py — `State` cells with get/set/
clear/temp contexts (unused by the main MLP path, kept for API parity and
future recurrent policies). In the functional JAX design, recurrent state is
just another pytree threaded through `scan`; this module provides the
ergonomic holder for host-side code.
"""
from __future__ import annotations

from contextlib import contextmanager


class State:
    """A named slot of recurrent state (reference recurrence.py:5-40)."""

    def __init__(self):
        self._value = None

    def get(self, factory=None):
        if self._value is None and factory is not None:
            self._value = factory()
        return self._value

    def set(self, value):
        self._value = value

    def clear(self):
        self._value = None

    @contextmanager
    def temp(self, value):
        """Temporarily override the state (reference recurrence.py:55-75)."""
        old = self._value
        self._value = value
        try:
            yield
        finally:
            self._value = old
