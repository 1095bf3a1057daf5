from tpu3drec.sfm.reconstruction import Camera, Reconstruction
from tpu3drec.sfm.pipeline import SfMPipeline, reconstruct_scene
from tpu3drec.sfm.quality import assess_reconstruction_quality
