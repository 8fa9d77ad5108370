from vae_assoc_tpu.data.pipeline import PairedDataset, featurize_pairs
from vae_assoc_tpu.data.synthetic import generate_raw_strokes
from vae_assoc_tpu.data.uji import load_uji_files, parse_uji_text
from vae_assoc_tpu.data.stream import prefetch_batches, stream_train

__all__ = [
    "PairedDataset",
    "featurize_pairs",
    "generate_raw_strokes",
    "load_uji_files",
    "parse_uji_text",
    "prefetch_batches",
    "stream_train",
]
