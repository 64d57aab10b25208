from srl_tpu.native.framestore import FrameStoreReader, FrameStoreWriter, available

__all__ = ["FrameStoreReader", "FrameStoreWriter", "available"]
