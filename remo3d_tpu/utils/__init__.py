# -*- coding: utf-8 -*-
"""Utilities: phase timers, structured logging."""

from .timers import PhaseTimers  # noqa: F401
