from .header_emit import emit_model_header
from .header_parser import (
    config_from_arrays,
    convert_reference_header,
    parse_model_header,
)
