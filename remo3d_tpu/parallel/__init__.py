# -*- coding: utf-8 -*-
"""Distributed runtime: device-mesh executor replacing the reference's MPI farm."""

from .runtime import Executor, ExecutorConfig  # noqa: F401
