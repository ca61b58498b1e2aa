from sst_tpu.core import anchors, box_coders, boxes, iou, losses, nms, target_assign
