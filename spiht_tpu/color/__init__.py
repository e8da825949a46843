from . import models
from .models import convert, SUPPORTED_MODELS
