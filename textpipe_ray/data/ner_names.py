"""Seed name lists for the trained NER stand-in (public common
knowledge: frequent given/family names, well-known geographic names,
generic organisation bases/suffixes).  Split deterministically into
TRAIN (model sees them) and HELD-OUT (never in training) halves so the
tagger's generalisation — classifying surface shapes it has never seen
— is what the tests measure, not memorisation.
"""

from __future__ import annotations

FIRST_NAMES = [
    "Anna", "Bruno", "Carla", "David", "Elena", "Frank", "Greta", "Hugo",
    "Ines", "Jonas", "Klara", "Lukas", "Marta", "Nils", "Olga", "Pavel",
    "Rosa", "Stefan", "Tessa", "Viktor", "Wanda", "Yusuf", "Zoe", "Marco",
    "Lena", "Oscar", "Petra", "Ralf", "Sofia", "Tomas", "Ursula", "Walter",
]

LAST_NAMES = [
    "Abrams", "Becker", "Costa", "Dubois", "Eriksen", "Fischer", "Garcia",
    "Hansen", "Ivanov", "Jansen", "Keller", "Larsen", "Moreau", "Nielsen",
    "Olsen", "Peters", "Quist", "Rossi", "Schmidt", "Tanaka", "Ullman",
    "Vogel", "Weber", "Xavier", "Yilmaz", "Zimmer", "Andersen", "Bauer",
    "Castro", "Dijkstra", "Engel", "Fontaine",
]

ORG_BASES = [
    "Acme", "Borealis", "Cobalt", "Deltaworks", "Everbright", "Fairfield",
    "Glowtech", "Harborline", "Ironclad", "Junction", "Keystone", "Lumina",
    "Meridian", "Northwind", "Orchid", "Pinnacle", "Quantum", "Riverton",
    "Summit", "Trident", "Unity", "Vanguard", "Westbrook", "Zenith",
    "Bluepeak", "Clearwater", "Dawnstar", "Eastgate", "Firebrand", "Goldleaf",
    "Hillcrest", "Silverline",
]

ORG_SUFFIXES = ["Inc", "Corp", "Ltd", "GmbH", "Group", "Labs", "Systems", "Holdings"]

GPE_NAMES = [
    "Amsterdam", "Berlin", "Copenhagen", "Dublin", "Edinburgh", "Florence",
    "Geneva", "Helsinki", "Istanbul", "Jakarta", "Krakow", "Lisbon",
    "Madrid", "Nairobi", "Oslo", "Prague", "Quito", "Rotterdam",
    "Stockholm", "Toronto", "Utrecht", "Vienna", "Warsaw", "Zurich",
    "Austria", "Belgium", "Croatia", "Denmark", "Estonia", "Finland",
    "Germany", "Hungary",
]

# Capitalised ordinary words that are NOT entities (negative class):
# sentence starters and mid-sentence capitalised common nouns.
PLAIN_WORDS = [
    "Today", "Yesterday", "However", "Meanwhile", "Reports", "Analysts",
    "Officials", "Revenue", "Results", "Quarterly", "Monday", "Spring",
    "Several", "Many", "Recent", "Local", "Annual", "General", "National",
    "International", "Morning", "Evening", "Industry", "Market",
]


def split_half(names: list[str]) -> tuple[list[str], list[str]]:
    """(train, held_out) by alternating index — deterministic, disjoint."""
    return names[0::2], names[1::2]
