"""Renderer: the top-level progressive rendering driver.

The TPU-native analog of the reference's TracerBoy class
(TracerBoy/TracerBoy.h:158-769): owns the compiled scene, the persistent
render state pytree (accumulators, history, rng counters), and the per-frame
step function. Placeholder until trace/shade land; grows with each phase.
"""

from __future__ import annotations


class RenderState:  # placeholder — defined fully once trace/ lands
    pass


class Renderer:  # placeholder — defined fully once trace/ lands
    pass
