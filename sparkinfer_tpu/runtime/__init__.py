from .kv_cache import KVCache, init_cache
from .sampling import SamplerConfig, SamplerState, init_state, make_sampler

__all__ = [
    "Engine",
    "PerfCounters",
    "KVCache",
    "init_cache",
    "SamplerConfig",
    "SamplerState",
    "init_state",
    "make_sampler",
]


def __getattr__(name):
    # engine imports models.transformer which imports runtime.kv_cache;
    # defer to break the package-init cycle.
    if name in ("Engine", "PerfCounters"):
        from . import engine

        return getattr(engine, name)
    raise AttributeError(name)
