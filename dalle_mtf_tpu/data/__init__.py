from dalle_mtf_tpu.data.tokenizer import get_tokenizer  # noqa: F401
from dalle_mtf_tpu.data.tfrecord import (  # noqa: F401
    TFRecordWriter,
    read_tfrecord_file,
    serialize_example,
    parse_example,
)
from dalle_mtf_tpu.data.pipeline import vae_input_fn, dalle_input_fn  # noqa: F401
