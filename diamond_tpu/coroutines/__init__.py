"""Host-side rollout engine.

The reference drives rollouts through auto-primed generator coroutines
(reference src/coroutines/__init__.py:4-11). Here the rollout state is explicit: EnvLoop and
Collector are classes with a ``send`` method mirroring the reference call sites, and all
device math is batched into a handful of jitted functions.
"""

from .collector import Collector, NumToCollect
from .env_loop import EnvLoop
