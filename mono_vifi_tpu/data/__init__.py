"""Host-side data pipeline: datasets, stateful resumable samplers, threaded
prefetching loader. Decode/augment runs on host CPU (PIL/numpy); batches are
fixed-shape numpy dicts transferred to device once per step."""

from mono_vifi_tpu.data.samplers import StatefulSampler, StatefulDistributedSampler
from mono_vifi_tpu.data.loader import DataLoader
from mono_vifi_tpu.data.kitti import KITTIRAWDataset, KITTIOdomDataset, KITTIDepthDataset
from mono_vifi_tpu.data.cityscapes import CityscapesDataset
from mono_vifi_tpu.data.nyuv2 import NYUDataset
from mono_vifi_tpu.data.make3d import Make3DDataset
from mono_vifi_tpu.data.vfi import KITTIVFIDataset, CityscapesVFIDataset
