from ivosw_tpu.models.vos.protocol import VOSAdapter, SegmentationResult

__all__ = ["VOSAdapter", "SegmentationResult"]
