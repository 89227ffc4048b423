from .model import VoltaModel, VoltaForVLPreTraining, VoltaForVLTasks

__all__ = ["VoltaModel", "VoltaForVLPreTraining", "VoltaForVLTasks"]
