from .tokenization import BertTokenizer
from .tensorize import (PretrainExample, TensorizeConfig, collate,
                        convert_example_to_features,
                        convert_qa_example_to_features, tensorize_example)
from .tsv import TSVFile, build_lineidx, tsv_writer

__all__ = [
    "BertTokenizer", "PretrainExample", "TensorizeConfig", "collate",
    "convert_example_to_features", "convert_qa_example_to_features",
    "tensorize_example", "TSVFile", "build_lineidx", "tsv_writer",
]
