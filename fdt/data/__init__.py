from fdt.data.anno import generate_anno_file, parse_anno_file, validate_anno_file, AnnoRecord
from fdt.data.collector import EvalCollector

__all__ = ["generate_anno_file", "parse_anno_file", "validate_anno_file",
           "AnnoRecord", "EvalCollector"]
