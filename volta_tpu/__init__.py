"""VOLTA-TPU: a TPU-native framework for unified vision-and-language BERTs.

One configurable gated bimodal encoder (JAX/Flax/Pallas) instantiates
ViLBERT, LXMERT, VL-BERT, VisualBERT and UNITER — plus their controlled
CTRL variants — purely from config, pretrains them on Conceptual Captions
and fine-tunes/evaluates on the V&L task suite.
"""

from .config import VoltaConfig, SublayerSpec

__version__ = "0.1.0"

__all__ = ["VoltaConfig", "SublayerSpec"]
