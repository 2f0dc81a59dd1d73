"""Model cores: config dataclasses + parameter pytrees + pure jitted forwards."""
