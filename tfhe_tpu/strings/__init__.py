from .ciphertext import FheString
from .server_key import StringServerKey
