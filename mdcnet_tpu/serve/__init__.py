"""Serving tier: continuous batching around the KV-cached decode."""
from mdcnet_tpu.serve.engine import (Completion, Request, ServingEngine,
                                     latency_stats)

__all__ = ["Completion", "Request", "ServingEngine", "latency_stats"]
