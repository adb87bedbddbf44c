from psi_tpu.nn.layers import ResBlock, Swish

__all__ = ["ResBlock", "Swish"]
