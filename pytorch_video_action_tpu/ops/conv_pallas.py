"""Pallas fused dilated-residual kernel for MS-TCN (inference path).

Placeholder fallback for now: returns None so ``ops.conv`` uses the XLA path.
The fused kernel (dilated 3-tap conv + relu + 1x1 conv + residual + mask in
one VMEM-resident pass) lands with the kernels milestone.
"""

from __future__ import annotations


def fused_dilated_residual(layer, x, mask, dilation):
    return None
