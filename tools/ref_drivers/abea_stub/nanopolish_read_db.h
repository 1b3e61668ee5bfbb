#pragma once
typedef struct ReadDB ReadDB;
