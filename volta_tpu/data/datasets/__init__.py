"""Dataset registry (reference: volta/datasets/__init__.py:42-78)."""

from .nlvr2 import NLVR2Dataset
from .qa import (GQAClassificationDataset, GenomeQAClassificationDataset,
                 VQAClassificationDataset)
from .refer_expression import ReferExpressionDataset
from .retrieval import RetrievalDataset, RetrievalDatasetVal
from .visual_entailment import VisualEntailmentDataset


def _missing(name):
    def raiser(*a, **kw):
        raise NotImplementedError(
            f"dataset {name!r} is not implemented yet in volta_tpu")
    return raiser


DatasetMapTrain = {
    "VQA": VQAClassificationDataset,
    "GenomeQA": GenomeQAClassificationDataset,
    "GQA": GQAClassificationDataset,
    "NLVR2": NLVR2Dataset,
    "VisualEntailment": VisualEntailmentDataset,
    "RetrievalCOCO": RetrievalDataset,
    "RetrievalFlickr30k": RetrievalDataset,
    "refcoco": ReferExpressionDataset,
    "refcoco+": ReferExpressionDataset,
    "refcocog": ReferExpressionDataset,
}

DatasetMapEval = dict(DatasetMapTrain)
DatasetMapEval["RetrievalCOCO"] = RetrievalDatasetVal
DatasetMapEval["RetrievalFlickr30k"] = RetrievalDatasetVal

__all__ = [
    "DatasetMapTrain", "DatasetMapEval",
    "VQAClassificationDataset", "GQAClassificationDataset",
    "GenomeQAClassificationDataset", "NLVR2Dataset",
    "VisualEntailmentDataset", "RetrievalDataset", "RetrievalDatasetVal",
    "ReferExpressionDataset",
]
