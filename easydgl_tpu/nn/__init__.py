from easydgl_tpu.nn.layers import (ContribLayerNorm, Dense, FeedForward,
                                   LastAxisLayerNorm, gelu_exact, gelu_tanh)
from easydgl_tpu.nn.coding import (Embedding, PositionCoding,
                                   TimeFunctionCoding, TimeIntervalCoding,
                                   TimeSinusoidCoding)
from easydgl_tpu.nn.attention import BERTAttention, MultiHeadAttention
from easydgl_tpu.nn.temporal import (MAU, BiMAU, MGAU, TfMultiHeadAttention,
                                     TgMultiHeadAttention,
                                     TiMultiHeadAttention)
from easydgl_tpu.nn.cnn import DilatedConv1D, MaskedCNN
from easydgl_tpu.nn.rnn import CudnnGRU
from easydgl_tpu.nn.mate import MATEncoder, TAHEncoder
