from .bitpack import bits_per_element, pack, packed_word_len, unpack

__all__ = ["bits_per_element", "pack", "packed_word_len", "unpack"]
