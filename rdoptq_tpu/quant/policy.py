"""Quantization policies: first/last-layer 8-bit, output act-quant
disable.

Parity with the reference's `set_first_last_layer_to_8bit` /
`disable_network_output_quantization` (quant_model.py:81-98) and the
last-decoder-layer act-quant exception (main2.py:272-278,
layer_opt.py:227-234).
"""

from __future__ import annotations

from typing import Sequence, Tuple

from . import wrap


def first_last_8bit(leaves: Sequence[wrap.LeafInfo]
                    ) -> Tuple[Tuple[str, int], ...]:
    """Bit overrides pinning the first and last quantizable weights to
    8-bit (reference quant_model.py:81-91)."""
    if not leaves:
        return ()
    return ((leaves[0].path, 8), (leaves[-1].path, 8))


def output_act_skips(model) -> frozenset:
    """Stage names whose output activations are never quantized: the final
    network output (quant_model.py:93-98) and the last synthesis layer
    (main2.py:272-278)."""
    skips = set()
    coders = model.coders
    if "g_s" in coders:
        skips.add(coders["g_s"].stages[-1].name)
    # the last module in definition order (= final ep conv when present)
    if "ep" in coders:
        skips.add(coders["ep"].stages[-1].name)
    return frozenset(skips)


__all__ = ["first_last_8bit", "output_act_skips"]
