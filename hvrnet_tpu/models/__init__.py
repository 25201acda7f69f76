from .registry import (BACKBONES, DETECTORS, HEADS, LOSSES, NECKS,
                       ROI_EXTRACTORS, SHARED_HEADS)
from . import losses  # registers loss classes
from .backbones.resnet import ResNet
from .shared_heads.res_layer import ResLayer
from .anchor_heads.rpn_head import RPNHead, rpn_proposals_single
from .bbox_heads.bbox_head import (BBoxHead, bbox_head_loss, flatten_roi_feats,
                                   get_det_bboxes)
from .bbox_heads.selsa_bbox_head import SelsaAttention, SelsaBBoxHead
from .bbox_heads.hrnmp_bbox_head import HRNMPBBoxHead, triplet_nonlocal_loss
from .roi_extractor import SingleRoIExtractor
from .two_stage import TwoStageModule
from .necks.fpn import BFP, FPN
from .bbox_heads.convfc_bbox_head import (ConvFCBBoxHead,
                                          DoubleConvFCBBoxHead,
                                          SharedFCBBoxHead)
from .anchor_heads.dense_heads import (FCOSHead, FoveaHead,
                                       FreeAnchorRetinaHead, GARetinaHead,
                                       RetinaHead, SSDHead)
from .backbones.resnext import ResNeXt, SSDVGG
from .backbones.hrnet import HRNet
from .backbones.res2net import Res2Layer, Res2NetV1b, ResXLayer
from .necks.hrfpn import HRFPN
from . import mask_heads  # registers FCN/HTC/MaskIoU/Grid/Semantic heads
from . import plugins  # NonLocal2D / ContextBlock / GeneralizedAttention
from .builder import (build_detector, build_model_module, build_roi_extractor)

__all__ = [
    "BACKBONES", "NECKS", "ROI_EXTRACTORS", "SHARED_HEADS", "HEADS", "LOSSES",
    "DETECTORS", "ResNet", "ResLayer", "RPNHead", "rpn_proposals_single",
    "BBoxHead", "SelsaBBoxHead", "SelsaAttention", "HRNMPBBoxHead",
    "triplet_nonlocal_loss", "bbox_head_loss", "get_det_bboxes",
    "flatten_roi_feats", "SingleRoIExtractor", "TwoStageModule",
    "build_detector", "build_model_module", "build_roi_extractor",
    "FPN", "BFP", "ConvFCBBoxHead", "SharedFCBBoxHead", "DoubleConvFCBBoxHead",
    "RetinaHead", "SSDHead", "FCOSHead", "FoveaHead", "ResNeXt", "SSDVGG",
    "HRNet", "Res2NetV1b", "Res2Layer", "ResXLayer", "HRFPN",
]
