"""Small runtime helpers."""

from __future__ import annotations

import ray


def pool_size(requested: int) -> int:
    """Actor-pool size capped at half the cluster CPUs so map pools never
    starve shuffle aggregators / read / write tasks (a full-CPU pool
    livelocks the streaming executor on small clusters). Mirrors the
    reference's resource-based pool sizing
    (``blarify/code_references/lsp_helper.py:97-191``)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(1, min(requested, cpus // 2))
