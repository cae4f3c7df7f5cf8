from .kv_cache import KVCache, init_cache
from .sampling import SamplerConfig, SamplerState, init_state, make_sampler

__all__ = [
    "Engine",
    "PerfCounters",
    "SpeculativeEngine",
    "LookupEngine",
    "LookaheadEngine",
    "DiffusionEngine",
    "DiffusionConfig",
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
    if name == "SpeculativeEngine":
        from .speculative import SpeculativeEngine

        return SpeculativeEngine
    if name == "LookupEngine":
        from .lookup import LookupEngine

        return LookupEngine
    if name == "LookaheadEngine":
        from .lookahead import LookaheadEngine

        return LookaheadEngine
    if name in ("DiffusionEngine", "DiffusionConfig"):
        from . import diffusion

        return getattr(diffusion, name)
    raise AttributeError(name)
