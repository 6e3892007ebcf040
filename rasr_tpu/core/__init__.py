"""Core foundation layer: configuration, parameters, components, channels,
archives, binary streams, format dispatch (reference: src/Core)."""

from .application import Application, application
from .archive import (Archive, ArchiveError, BundleArchive, DirectoryArchive,
                      FileArchive, open_archive)
from .binary_stream import BinaryReader, BinaryWriter, pack_to_bytes
from .channel import Channel, ChannelManager, XmlWriter
from .component import Component, ComponentError
from .configuration import Configuration, ConfigurationError
from .formats import FORMATS, FormatSet, split_qualifier
from .parameter import (Choice, Parameter, ParameterBitVector, ParameterBool,
                        ParameterChoice, ParameterFloat, ParameterFloatVector,
                        ParameterInt, ParameterIntVector, ParameterString,
                        ParameterStringVector)

__all__ = [
    "Application", "application",
    "Archive", "ArchiveError", "BundleArchive", "DirectoryArchive",
    "FileArchive", "open_archive",
    "BinaryReader", "BinaryWriter", "pack_to_bytes",
    "Channel", "ChannelManager", "XmlWriter",
    "Component", "ComponentError",
    "Configuration", "ConfigurationError",
    "FORMATS", "FormatSet", "split_qualifier",
    "Choice", "Parameter", "ParameterBitVector", "ParameterBool",
    "ParameterChoice", "ParameterFloat", "ParameterFloatVector",
    "ParameterInt", "ParameterIntVector", "ParameterString",
    "ParameterStringVector",
]
