from .paths import field_name_to_column

__all__ = ["field_name_to_column"]
