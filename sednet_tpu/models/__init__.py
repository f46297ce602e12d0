from sednet_tpu.models.backbone import DGCNNEncoder, EdgeConv
from sednet_tpu.models.sednet import SEDNet, SEDNetOutput
from sednet_tpu.models.splinenet import SplineNet
