"""init subpackage."""
