from rnntransducer_tpu.models.cells import RNNLayer, RNNState, StackedRNN
from rnntransducer_tpu.models.encoder import AudioEncoder
from rnntransducer_tpu.models.joint import JointNetwork
from rnntransducer_tpu.models.prednet import PredictionNet
from rnntransducer_tpu.models.transducer import RNNTransducer

__all__ = [
    "RNNLayer", "RNNState", "StackedRNN",
    "AudioEncoder", "PredictionNet", "JointNetwork", "RNNTransducer",
]
