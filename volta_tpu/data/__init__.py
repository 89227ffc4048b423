from .features_reader import ImageFeaturesReader
from .loader import DataLoader, collate
from .tokenization import BertTokenizer

__all__ = ["ImageFeaturesReader", "DataLoader", "collate", "BertTokenizer"]
