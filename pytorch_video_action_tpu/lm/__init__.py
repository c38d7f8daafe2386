from .arpa import ArpaLanguageModel, LanguageModel, load_lm
from .train_arpa import train_arpa
